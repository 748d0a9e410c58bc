package graft.tools

import org.apache.spark.sql.functions._

/** Measures q158's bound-oracle inputs on the real tables (the RecallProbe
  * pattern): overall recall of IVF-PQ against exact top-k, and the residual-
  * ADC relative-error stats over probed exact pairs. Run per sf before
  * setting/raising the q158 flag bounds:
  * sbt "runMain graft.tools.IvfPqProbe /root/testdata/sf0.01" */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.Graft.sessionBuilder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.embeddings(spark, sfDir)
    val exact = graft.queries.SimilarityQueries
      .bruteTopK(e, Seq(0L, 1L, 2L), 10).localCheckpoint(true)
    val (approx, rel, cover) = graft.queries.SimilarityQueries
      .ivfPqParts(e, Seq(0L, 1L, 2L), 10, exact)
    val hits = exact.select("qid", "vec_id")
      .join(approx.select(col("qid"), col("vec_id"), lit(1L).as("hit")),
        Seq("qid", "vec_id"), "left")
      .agg(sum("hit").as("n_hit"), count(lit(1)).as("n_exact")).head()
    println(s"[ivfpq] $sfDir recall: ${hits.getAs[Long]("n_hit")} / " +
      s"${hits.getAs[Long]("n_exact")}")
    val st = rel.agg(count(lit(1)).as("n"), avg("rel").as("mean"),
      max("rel").as("max")).head()
    println(f"[ivfpq] $sfDir adc rel-err over ${st.getAs[Long]("n")} probed " +
      f"pairs: mean ${st.getAs[Double]("mean")}%.4f max ${st.getAs[Double]("max")}%.4f")
    println(f"[ivfpq] $sfDir probed coverage: " +
      f"${cover.head().getAs[Double]("cover")}%.4f (recall_ok gates >= 0.10)")
    spark.stop()
  }
}
