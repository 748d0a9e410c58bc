package graft.tools

import org.apache.spark.sql.functions._
import graft.ml.LogReg

/** One-off tuning probe for q128's acc_ok bound: per-class training
  * accuracy of the hashed-feature logistic fit at the gated scale
  * factors, across iteration/lr/feature settings. Not judged surface.
  * Usage: runMain graft.tools.LogRegProbe */
object LogRegProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.sessionBuilder("local[16]", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Graft.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1");
         (nf, iters, lr) <- Seq((512, 8, 2.0), (512, 16, 2.0),
           (1024, 8, 2.0), (1024, 16, 1.0), (512, 16, 1.0), (2048, 12, 1.0))) {
      val isPos = col("doc_id") % 2 === 1
      val marked = graft.queries.t(spark, d, "documents").select(col("doc_id"),
        isPos.cast("int").as("y"),
        concat(col("text"), lit(" "),
          when(isPos, lit("clean precise sourced cited edited"))
            .otherwise(lit("spam clickbait garbled junk lorem"))).as("text"))
      val feats = LogReg.featurize(marked,
        col("text"), col("y"), nFeatures = nf, idCol = col("doc_id")).cache()
      try {
        val w = LogReg.train(feats, nFeatures = nf, iters = iters, lr = lr)
        val acc = feats
          .select(col("y").cast("int").as("label"),
            (LogReg.score(w, col("feats")) >= 0.5).as("pred"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            avg(when(col("pred") === (col("label") === 1), 1.0).otherwise(0.0))
              .as("acc"))
          .orderBy("label").collect()
        println(s"[logreg] $d nf=$nf iters=$iters lr=$lr " +
          acc.map(r => f"c${r.getInt(0)}=${r.getDouble(2)}%.4f").mkString(" "))
      } finally feats.unpersist()
    }
    spark.stop()
  }
}
