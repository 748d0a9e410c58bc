package graft.tools

import org.apache.spark.sql.functions._

/** Evidence harness for the graph-query exponents (round-13 sf10 probe:
  * q100 0.91, q290 1.07, q330 1.03, q231 1.27): every one of those
  * queries is per-round equi-join + partial agg — LINEAR IN EDGES — so
  * the question is whether the EDGE SET itself grows superlinearly on
  * this corpus. This probe counts the shared-3-gram pair frame
  * (DedupQueries.ngramPairs, the common graph miner) at two corpus
  * scales so the exponent can be attributed: edges growing ~n^e explains
  * a time exponent ~e for an edge-linear algorithm.
  * sbt "runMain graft.tools.EdgeProbe <dirA> <dirB>" */
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.length >= 2) args.toSeq
      else Seq("/tmp/graft-sf1-real", "/tmp/graft-sf10-real")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Graft.sessionBuilder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { d =>
      val docs = graft.Tables.load(spark, d, "documents")
      val n = docs.count()
      val src0 = docs.filter(col("source") === "src0")
      val nSrc0 = src0.count()
      val (cand, pairDf) =
        graft.queries.DedupQueries.ngramPairsWithCandidates(src0, 0.7)
      val nCand = cand.count()
      val pairs = pairDf.count()
      println(f"[edges] $d%-24s docs=$n%9d src0=$nSrc0%8d " +
        f"candidates=$nCand%12d ngramPairs(src0,0.7)=$pairs%12d " +
        f"pairs/doc=${pairs.toDouble / nSrc0}%8.2f")
    }
    spark.stop()
  }
}
