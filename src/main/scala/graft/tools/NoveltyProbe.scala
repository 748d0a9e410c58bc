package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One-off perf probe for q176: where do the ~5 s go, and does a
  * groupBy+join first-seen beat the gram-partitioned window? Not part of
  * the judged surface. Usage: runMain graft.tools.NoveltyProbe [sfDir] */
object NoveltyProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.sessionBuilder("local[32]", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.t(spark, d, "documents")
    def time(label: String)(f: => Long): Unit = {
      // warm + 2 measured
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"[novelty] $label%-28s min=${ts.map(_._1).min}%.2fs rows=${ts.head._2}")
    }
    val w = split(lower(col("text")), " ")
    val grams3 = when(size(w) >= 3,
      array_distinct(transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1),
          element_at(w, i + 2))))).otherwise(array().cast("array<string>"))
    val g = docs.select(col("doc_id"), explode(grams3).as("gram"))
    time("explode only")(g.count())
    // materialize the token array in its own projection so codegen
    // evaluates split() once per row, not once per element_at reference
    val wm = col("w")
    val grams3m = when(size(wm) >= 3,
      array_distinct(transform(sequence(lit(1), size(wm) - 2),
        i => concat_ws(" ", element_at(wm, i), element_at(wm, i + 1),
          element_at(wm, i + 2))))).otherwise(array().cast("array<string>"))
    val gm = docs.select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      .select(col("doc_id"), explode(grams3m).as("gram"))
    time("explode materialized w")(gm.count())
    time("window first-seen") {
      val wg = Window.partitionBy("gram")
      g.withColumn("first_doc", min("doc_id").over(wg))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
            .as("n_new")).count()
    }
    time("groupBy+join first-seen") {
      val fs = g.groupBy("gram").agg(min("doc_id").as("first_doc"))
      g.join(fs, "gram")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
            .as("n_new")).count()
    }
    time("full q176")(graft.SparkEntry.queries("q176_novelty_curve")(spark, d).count())
    spark.stop()
  }
}
