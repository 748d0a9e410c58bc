package graft.tools

import org.apache.spark.sql.functions._

/** Perf probe: does staging the word array before the shingle transform
  * matter the way it did for q176/q89 (inline split re-evaluated per
  * element)? Times the full minhash signature both ways. Not judged.
  * Usage: runMain graft.tools.ShingleProbe [sfDir] */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.sessionBuilder("local[32]", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.t(spark, d, "documents")
    def time(label: String)(f: => Long): Unit = {
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"[shingle] $label%-26s min=${ts.map(_._1).min}%.2fs rows=${ts.head._2}")
    }
    time("sig inline (current)") {
      docs.select(col("doc_id"),
        graft.dedup.Dedup.minhashSignature(col("text"), 16).as("sig")).count()
    }
    val w = col("w")
    val shinglesFromW = array_distinct(transform(
      sequence(lit(1), greatest(size(w) - 2, lit(1))),
      i => concat_ws(" ", slice(w, i, lit(3)))))
    time("sig staged w + shingles") {
      docs.select(col("doc_id"), split(lower(col("text")), "\\s+").as("w"))
        .select(col("doc_id"), shinglesFromW.as("sh"))
        .select(col("doc_id"),
          aggregate(col("sh"),
            array_repeat(lit(Long.MaxValue), 16),
            (acc, s2) => zip_with(acc,
              transform(sequence(lit(0), lit(15)), i => xxhash64(s2, i)),
              (a, h) => least(a, h))).as("sig")).count()
    }
    spark.stop()
  }
}
