package graft.tools

import org.apache.spark.sql.functions._

/** One-off timing probe for q100's phases (pair mine vs PageRank rounds).
  * Not part of the judged surface. */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Graft.sessionBuilder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Graft.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    // warm
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Tables.names.foreach(n => graft.Tables.load(spark, d, n).count())

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pr-probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val src0 = graft.queries.t(spark, d, "documents")
      .filter(col("source") === "src0")
      .select("doc_id", "lang", "n_chars", "text")
    val doubled = src0.unionByName(
      src0.withColumn("doc_id", col("doc_id") + 1099511627776L))
    val pairs = timed("pair-mine+checkpoint") {
      graft.queries.DedupQueries.ngramPairs(doubled, 0.7).localCheckpoint(true)
    }
    println(s"[pr-probe] n_pairs=${pairs.count()}")
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    // NOTE: PageRank.run auto-suspends AQE in the tiny-graph regime
    // (iterPar == 1), so both labels below measure the SUSPENDED config —
    // the pair is a repeatability check, not an on/off comparison. The
    // original on/off measurement (2.3 s vs 1.5 s) predates that change.
    val ranks = timed("pagerank-4-rounds") {
      graft.ml.PageRank.run(edges, iters = 4, assumeNoDangling = true)
    }
    timed("pagerank-4-rounds-repeat") {
      graft.ml.PageRank.run(edges, iters = 4, assumeNoDangling = true).count()
    }
    timed("final-sort-limit-count") {
      ranks.select(col("id").as("doc_id"), round(col("rank"), 6).as("rank"))
        .orderBy(col("rank").desc, col("doc_id")).limit(20).count()
    }
    // PQ fit under AQE on/off — the k-means-family iteration cost probe
    val e = graft.queries.t(spark, d, "embeddings")
    for (aqe <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      timed(s"pq-fit-encode-search aqe=$aqe") {
        val model = graft.ml.ProductQuantizer.fit(e, "vec_id", "embedding",
          dim = 64, m = 4, k = 16, iters = 3)
        val codes = graft.ml.ProductQuantizer.encode(e, "vec_id", "embedding", model)
        val q = e.filter(col("vec_id").isin(0L, 1L, 2L))
        val tabs = graft.ml.ProductQuantizer.adcTables(q, "vec_id", "embedding", model)
        graft.ml.ProductQuantizer.search(codes, "vec_id", tabs, 10).count()
      }
      timed(s"kmeans-fit aqe=$aqe") {
        graft.ml.KMeans.fit(e, "vec_id", "embedding", 16, 3)
      }
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
