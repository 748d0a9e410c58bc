package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions, VectorOps}

/** Similarity search over the `embeddings` table (SURVEY.md §7.4):
  * brute-force cosine top-k as the exact baseline, LSH-bucketed (IVF-style
  * inverted lists) as the scale path.
  */
object SimilarityQueries {
  import org.apache.spark.sql.DataFrame

  /** Exact cosine top-k: query rows broadcast, corpus streams once. The
    * recall baseline every approximate variant below is judged against
    * (reused by SimilaritySpec on its clustered corpus). */
  def bruteTopK(e: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val scored = broadcast(q).join(e, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorFunctions.cosineFast(col("qe"), col("embedding")).as("c"))
    val w = Window.partitionBy("qid").orderBy(col("c").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"),
        round(col("c"), 4).as("score"))
      .orderBy("qid", "rank")
  }

  /** Multi-probe sign-LSH approximate top-k: buckets as inverted lists,
    * each query probes its own bucket plus every one-bit flip. */
  def ivfLshTopK(e: DataFrame, queryIds: Seq[Long], k: Int,
      nBits: Int = 4): DataFrame = {
    val planes = VectorOps.hyperplanes(nBits = nBits, dim = 64)
    val b = e.withColumn("bucket", VectorOps.lshBucket(col("embedding"), planes))
    val q = b.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        explode(VectorOps.lshProbes(col("embedding"), planes)).as("bucket"))
    val scored = broadcast(q).join(b, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      // a candidate can surface from several probed buckets — dedupe pairs
      .dropDuplicates("qid", "vec_id")
      .select(col("qid"), col("vec_id"),
        VectorFunctions.cosineFast(col("qe"), col("embedding")).as("c"))
    val w = Window.partitionBy("qid").orderBy(col("c").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"),
        round(col("c"), 4).as("score"))
      .orderBy("qid", "rank")
  }

  /** k-means-IVF approximate top-k: learned centroids (graft.ml.KMeans)
    * as inverted lists; each query rescans only its `nProbe` nearest
    * lists. Unlike data-oblivious LSH planes, the lists follow the
    * corpus's own density — on clustered data recall at equal probe
    * fraction is far higher (pinned by SimilaritySpec). */
  def ivfKmeansTopK(e: DataFrame, queryIds: Seq[Long], k: Int,
      nLists: Int = 16, nProbe: Int = 4, iters: Int = 3): DataFrame = {
    val cents = graft.ml.KMeans.fit(e, "vec_id", "embedding", nLists, iters)
    val cdf = graft.ml.KMeans.centroidsDF(e.sparkSession, cents)
    // assignWithVec carries the vector through the argmax — building the
    // inverted lists costs one pass instead of assign + corpus join-back
    val lists = graft.ml.KMeans.assignWithVec(e, "vec_id", "embedding", cdf)
      .select(col("vec_id"), col("cid"), col("embedding"))
    val q = e.filter(col("vec_id").isin(queryIds: _*))
    val probed = graft.ml.KMeans.probes(q, "vec_id", "embedding", cdf, nProbe)
      .withColumnRenamed("vec_id", "qid")
      .join(q.select(col("vec_id").as("qid"), col("embedding").as("qe")), Seq("qid"))
    val scored = broadcast(probed).join(lists, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorFunctions.cosineFast(col("qe"), col("embedding")).as("c"))
    val w = Window.partitionBy("qid").orderBy(col("c").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"),
        round(col("c"), 4).as("score"))
      .orderBy("qid", "rank")
  }

  val defs: Seq[QueryDef] = Seq(

    // Exact k-NN: 3 query vectors × full corpus, native codegen'd cosine,
    // top-10 per query via ranking window. The query side is tiny and
    // broadcast, the corpus side streams — one narrow pass + one shuffle on
    // the (3-row) partition key for the top-k.
    QueryDef.sql(
      "q50_knn_brute",
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe
        |           FROM embeddings WHERE vec_id IN (0, 1, 2)),
        |     s AS (SELECT qid, vec_id,
        |                  CAST(list_cosine_similarity(qe, embedding) AS DOUBLE) AS c
        |           FROM q JOIN embeddings ON vec_id <> qid),
        |     r AS (SELECT qid, vec_id, c,
        |                  row_number() OVER (PARTITION BY qid
        |                                     ORDER BY c DESC, vec_id) AS rn
        |           FROM s)
        |SELECT qid, rn AS rank, vec_id, round(c, 4) AS score
        |FROM r WHERE rn <= 10
        |ORDER BY qid, rank""".stripMargin) { (s, d) =>
      bruteTopK(t(s, d, "embeddings"), Seq(0L, 1L, 2L), 10)
    },

    // IVF-style approximate k-NN: sign-LSH buckets as inverted lists; each
    // query multi-probes its own list plus every one-bit-flip neighbor
    // (5 of 16 lists at 4 bits — bounded, corpus-size-independent fan-out
    // per query, which is what survives a 100× scale-up; single-probe
    // recall is the classic sign-LSH weakness). Approximate ⇒ rows-only;
    // recall vs the exact q50 is pinned by SimilaritySpec.
    QueryDef.rowsOnly("q51_knn_ivf_lsh") { (s, d) =>
      ivfLshTopK(t(s, d, "embeddings"), Seq(0L, 1L, 2L), 10)
    },

    // k-means-IVF approximate k-NN: data-adaptive inverted lists (learned
    // centroids) instead of q51's oblivious hyperplanes — the production
    // IVF shape. Probing 4 of 16 lists bounds per-query work to ~1/4 of
    // the corpus regardless of scale. Approximate + float-mean centroids ⇒
    // rows-only; recall on a clustered corpus is pinned by SimilaritySpec,
    // centroid quality by KMeansSpec.
    QueryDef.rowsOnly("q84_knn_ivf_kmeans") { (s, d) =>
      ivfKmeansTopK(t(s, d, "embeddings"), Seq(0L, 1L, 2L), 10)
    },

    // Same exact k-NN semantics as q50, but through the custom typed
    // TopKAggregator instead of a ranking window: map-side partial top-k
    // (each task reduces to ≤k rows before the shuffle) — the plan that
    // survives groups with billions of rows. Oracle-checked against the
    // identical SQL as q50, proving the custom aggregate reproduces the
    // window formulation bit-for-bit.
    QueryDef.sql(
      "q52_knn_topk_agg",
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe
        |           FROM embeddings WHERE vec_id IN (0, 1, 2)),
        |     s AS (SELECT qid, vec_id,
        |                  CAST(list_cosine_similarity(qe, embedding) AS DOUBLE) AS c
        |           FROM q JOIN embeddings ON vec_id <> qid),
        |     r AS (SELECT qid, vec_id, c,
        |                  row_number() OVER (PARTITION BY qid
        |                                     ORDER BY c DESC, vec_id) AS rn
        |           FROM s)
        |SELECT qid, rn AS rank, vec_id, round(c, 4) AS score
        |FROM r WHERE rn <= 10
        |ORDER BY qid, rank""".stripMargin) { (s, d) =>
      import s.implicits._
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id").isin(0, 1, 2))
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val scored = broadcast(q).join(e, col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          VectorFunctions.cosineFast(col("qe"), col("embedding")).as("c"))
        .as[(Long, Long, Double)]
      val agg = new graft.functions.TopKAggregator(10)
      scored.groupByKey(_._1)
        .mapValues(r => (r._3, r._2))
        .agg(agg.toColumn.name("topk"))
        .flatMap { case (qid, topk) =>
          topk.zipWithIndex.map { case ((score, id), i) =>
            (qid, i + 1, id, score)
          }
        }
        .toDF("qid", "rank", "vec_id", "score")
        .select(col("qid"), col("rank"), col("vec_id"),
          round(col("score"), 4).as("score"))
        .orderBy("qid", "rank")
    },

    // Product-quantization ANN (graft.ml.ProductQuantizer): the corpus is
    // stored as m=4 code ids (64× smaller than the raw floats) and queries
    // score the compressed codes directly — per query an m×16 table of
    // exact sub-distances, then every corpus vector costs 4 array lookups,
    // row-local in codegen. The compressed-index answer to "the corpus no
    // longer fits": where q84's IVF bounds how MUCH is scanned, PQ bounds
    // what each scanned row COSTS (and the two compose in a real system).
    // Approximate (quantized distances) ⇒ rows-only; recall vs exact L2 on
    // a clustered corpus is pinned by ProductQuantizerSpec.
    QueryDef.rowsOnly("q117_pq_ann") { (s, d) =>
      import graft.ml.ProductQuantizer
      val e = t(s, d, "embeddings")
      val model = ProductQuantizer.fit(e, "vec_id", "embedding",
        dim = 64, m = 4, k = 16, iters = 3)
      val codes = ProductQuantizer.encode(e, "vec_id", "embedding", model)
      val q = e.filter(col("vec_id").isin(0, 1, 2))
      val tabs = ProductQuantizer.adcTables(q, "vec_id", "embedding", model)
      ProductQuantizer.search(codes, "vec_id", tabs, 10)
        .orderBy("qid", "rank")
    }
  )
}
