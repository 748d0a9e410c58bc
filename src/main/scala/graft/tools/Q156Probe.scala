package graft.tools

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Stage-level timing probe for q156's pipeline (run: sbt "runMain
  * graft.tools.Q156Probe [sfDir]"). Isolates LSH candidate generation,
  * the banded mine, the gram verify, and CC so a bench regression can be
  * attributed to one stage instead of re-guessing from the total. */
object Q156Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Graft.sessionBuilder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val src0 = graft.Tables.documents(spark, sfDir)
      .filter(col("source") === "src0")
      .select("doc_id", "lang", "n_chars", "text")
    val doubled = src0.unionByName(
      src0.withColumn("doc_id", col("doc_id") + 1099511627776L)).localCheckpoint(true)
    println(s"[probe] corpus rows: ${doubled.count()}")
    time("shingles only")(
      doubled.select(col("doc_id"), Dedup.charNgrams(col("text")).as("g"))
        .agg(sum(size(col("g")))).collect())
    time("minhash signature")(
      doubled.select(col("doc_id"),
        Dedup.minhashSignature(col("text"), 16).as("sig"))
        .agg(sum(size(col("sig")))).collect())
    time("band keys (sig+bands)")(
      doubled.select(col("doc_id"),
        Dedup.bandKeys(Dedup.minhashSignature(col("text"), 16), 4, 4).as("bks"))
        .agg(sum(size(col("bks")))).collect())
    val cand = time("lsh candidates")(
      Dedup.minhashCandidates(doubled, "doc_id", "text").localCheckpoint(true))
    println(s"[probe] lsh candidate pairs: ${cand.count()}")
    val g = time("gram frame checkpoint")(
      doubled.repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          array_sort(transform(Dedup.charNgrams(col("text")),
            gr => xxhash64(gr))).as("gh")).localCheckpoint(true))
    val verified = time("verify join")(
      {
        val paired = cand
          .join(g.select(col("doc_id").as("id_a"), col("gh").as("gh_a")), Seq("id_a"))
          .join(g.select(col("doc_id").as("id_b"), col("gh").as("gh_b")), Seq("id_b"))
        val inter = graft.functions.VectorFunctions.sortedIntersectCount(
          col("gh_a"), col("gh_b"))
        val j = inter.cast("double") / (size(col("gh_a")) + size(col("gh_b")) - inter)
        paired.filter(j >= 0.7).select("id_a", "id_b").localCheckpoint(true)
      })
    println(s"[probe] verified pairs: ${verified.count()}")
    time("connected components")(
      Dedup.connectedComponents(
        verified.select(col("id_a").as("src"), col("id_b").as("dst"))).count())
    spark.stop()
  }
}
