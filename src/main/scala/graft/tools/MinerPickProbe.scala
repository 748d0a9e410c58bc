package graft.tools

import org.apache.spark.sql.functions._

/** Prints the pair miner's cost-based strategy pick (and both cost
  * estimates) for the q330-shaped graph corpus (tripled src0) of each
  * argument directory — the measurement harness behind the
  * DedupSkewSpec pick rows and the q330 scale adjudication. */
object MinerPickProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft-sf1-zipf", "/tmp/graft-sf10-zipf")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Graft.sessionBuilder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { d =>
      val docs = graft.Tables.load(spark, d, "documents")
      val src0 = docs.filter(col("source") === "src0")
        .select("doc_id", "lang", "n_chars", "text")
      val tripled = src0
        .unionByName(src0.withColumn("doc_id", col("doc_id") + 1099511627776L))
        .unionByName(src0.withColumn("doc_id", col("doc_id") + 2199023255552L))
      for ((name, corpus) <- Seq(("src0", src0), ("tripled", tripled))) {
        val p = graft.queries.DedupQueries.minerPrep(corpus, 0.7)
        val pick = if (p.prefixWins) "prefix" else "block"
        // the TRUE prefix-join enumeration (pre-4101c3d exact formula):
        // rank frame + sum over (prefix gram, lang) of cnt^2
        val t0 = System.nanoTime()
        val ceilT = floor((col("sz").cast("long") * p.num + (p.den - 1))
          / p.den)
        val pref = p.e.join(p.dfTbl, Seq("h"))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("doc_id").orderBy(col("df"), col("h"))))
          .filter(col("rk") <= col("sz") - ceilT + 1)
        val exact = pref.groupBy("h", "lang")
          .agg(count(lit(1)).as("c"))
          .agg(sum(col("c") * col("c"))).head().getAs[Any](0) match {
            case null => 0L
            case v: Long => v
          }
        val exactMs = (System.nanoTime() - t0) / 1000000
        println(f"[pick] $d%-24s $name%-8s pick=$pick%-6s " +
          f"histPrefCost=${p.prefCost}%14d exactPrefCost=$exact%14d " +
          f"blockCost=${p.blockCost}%14d exactEstMs=$exactMs%6d")
      }
    }
    spark.stop()
  }
}
