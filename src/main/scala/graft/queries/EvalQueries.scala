package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation metrics as queries — the measurement side of the
  * classifier/filter pipeline (q128's training, q61's heuristics): ROC AUC
  * via the tie-averaged Mann-Whitney rank-sum, and precision@k for the
  * "keep the top slice" curation decision. Everything stays in exact
  * integer/half-integer arithmetic until the single final division
  * (row numbers are ints; tie-averaged ranks are means of consecutive
  * ints, i.e. exact halves), so both engines agree bit-for-bit at 6dp.
  *
  * Scale note: the AUC never ranks individual rows — the rank-sum is
  * reconstructed from per-distinct-score group counts (see [[aucFrame]]),
  * so the only ordered window runs over the distinct-score table and the
  * corpus passes through a single partial+final aggregate. That holds even
  * when the scored frame is the whole corpus, as in q136.
  */
object EvalQueries {

  /** q296's rank discounts w_i = round(1e10 / log2(i+1)), i = 1..10 —
    * computed once in Scala and shipped to BOTH engines as BIGINT
    * literals (the q294 sign-matrix discipline), so no engine evaluates
    * a transcendental at query time and the DCG dot product is an exact
    * integer. */
  private val ndcgW: Seq[Long] =
    (1 to 10).map(i => math.round(1e10 / (math.log(i + 1.0) / math.log(2.0))))

  /** The 10-term ideal-DCG polynomial over per-query grade counts
    * (n3/n2/n1 = relevant candidates of gain 7/3/1): position i of the
    * ideal ranking holds the best remaining grade, expressed as a CASE
    * ladder — ONE template string parsed by both engines (the WelchExprs
    * discipline), all-integer. */
  private val idcgIntSql: String = (1 to 10).map { i =>
    s"${ndcgW(i - 1)} * (CASE WHEN $i <= n3 THEN 7 WHEN $i <= n3 + n2 " +
      s"THEN 3 WHEN $i <= n3 + n2 + n1 THEN 1 ELSE 0 END)"
  }.mkString("(CAST(", " + ", " AS BIGINT))")

  /** Tie-averaged Mann-Whitney ROC AUC over a (doc_id, s, y) frame as a
    * LAZY one-row frame (column `auc`) — higher score ranks positive.
    *
    * The tie-averaged rank of every row with score s is
    * `C(s) + (m(s)+1)/2` — rows below s, plus the middle of the tie run —
    * so the rank-sum needs no per-row ranking at all: one groupBy collapses
    * the corpus to its distinct scores, and the only ordered window runs
    * over THAT (Zipf-small) score table. The corpus itself is touched by
    * exactly one partial+final aggregate; nothing corpus-sized is sorted,
    * which is what makes this form safe when the scored frame IS the whole
    * corpus (q136) and not just a gold slice. All terms stay exact
    * (counts are ints, the tie midpoint an exact half) up to the one final
    * division, so both engines agree bit-for-bit at 6dp. Composed fully
    * lazily (class counts ride a broadcast cross-join, not a driver
    * collect), so building a query on top of it runs no jobs. EvalSpec
    * pins direction (separated → 1, inverted → 0, all-tied → exactly
    * 0.5). */
  def aucFrame(scored: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val groups = scored.groupBy("s")
      .agg(count(lit(1)).as("m"), sum("y").cast("double").as("pm"))
    val below = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = groups.withColumn("c", coalesce(sum("m").over(below), lit(0L)))
    val counts = scored.agg(sum("y").cast("double").as("p"),
      (count(lit(1)) - sum("y")).cast("double").as("n"))
    ranked.crossJoin(broadcast(counts))
      .agg(((sum(col("pm") * (col("c") + (col("m") + 1) / 2.0))
        - first("p") * (first("p") + 1) / 2.0) / (first("p") * first("n")))
        .as("auc"))
  }

  /** Driver-side scalar form of [[aucFrame]] (what the spec asserts on). */
  def rocAuc(scored: org.apache.spark.sql.DataFrame): Double =
    aucFrame(scored).head().getDouble(0)

  /** q320's weighted-isotonic core via the exact minimax identity
    * fit_i = max_{j≤i} min_{k≥i} pooled-rate(j..k), window-free over a
    * (b, n, c) bin frame — the PAVA solution without a data-dependent
    * loop. Returns (i, fit). Public for IsotonicSpec (monotonicity +
    * hand-PAVA parity on crafted profiles). */
  def isotonicFit(bins: DataFrame): DataFrame = {
    val aa = bins.selectExpr("b AS j").join(
        broadcast(bins.selectExpr("b AS k")), expr("k >= j"))
      .join(broadcast(bins.selectExpr("b AS bb", "n", "c")),
        expr("bb BETWEEN j AND k"))
      .groupBy("j", "k")
      .agg((sum("c").cast("double") / sum("n")).as("a"))
    val mi = bins.selectExpr("b AS i")
      .join(broadcast(aa), expr("j <= i AND k >= i"))
      .groupBy("i", "j").agg(min("a").as("mn"))
    mi.groupBy("i").agg(max("mn").as("fit"))
  }

  val defs: Seq[QueryDef] = Seq(

    // Score = document length; label = contains the rare 'dup' marker
    // (25/500 positives — a real, sparse signal). AUC answers "does length
    // rank dup-docs high?"; p@100 answers "how pure is the kept top slice".
    QueryDef.sql(
      "q136_eval_metrics",
      """WITH scored AS (
        |  SELECT doc_id, n_chars::DOUBLE AS s,
        |         CASE WHEN contains(text, 'dup') THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |ranked AS (
        |  SELECT y,
        |         avg(r) OVER (PARTITION BY s) AS ar
        |  FROM (SELECT s, y,
        |               row_number() OVER (ORDER BY s, doc_id) AS r
        |        FROM scored)),
        |counts AS (SELECT sum(y) AS p, count(*) - sum(y) AS n FROM scored),
        |auc AS (
        |  SELECT round((sum(CASE WHEN y = 1 THEN ar ELSE 0 END)
        |                 - (SELECT p FROM counts) * ((SELECT p FROM counts) + 1) / 2.0)
        |               / ((SELECT p FROM counts) * (SELECT n FROM counts)), 6) AS v
        |  FROM ranked),
        |topk AS (
        |  SELECT round(sum(y) / 100.0, 6) AS v
        |  FROM (SELECT y FROM scored ORDER BY s DESC, doc_id LIMIT 100))
        |SELECT 'auc' AS metric, v AS value FROM auc
        |UNION ALL
        |SELECT 'p_at_100', v FROM topk
        |ORDER BY metric""".stripMargin) { (s, d) =>
      val scored = t(s, d, "documents")
        .select(col("doc_id"), col("n_chars").cast("double").as("s"),
          when(col("text").contains("dup"), 1L).otherwise(0L).as("y"))
      val auc = aucFrame(scored).select(
        lit("auc").as("metric"), round(col("auc"), 6).as("value"))
      val topk = scored.orderBy(col("s").desc, col("doc_id")).limit(100)
        .agg(round(sum("y") / 100.0, 6).as("value"))
        .select(lit("p_at_100").as("metric"), col("value"))
      auc.unionByName(topk).orderBy("metric")
    },

    // Calibration profile: fixed-width score bins vs observed positive
    // rate — the reliability-diagram table a filter gets judged on before
    // its threshold is trusted. Bins are integer-exact (length div 100,
    // capped), the rate is the one final division. Single partial+final
    // aggregate.
    QueryDef.sql(
      "q145_calibration",
      """SELECT least(n_chars // 100, 5) AS bin,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN contains(text, 'dup') THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |       round(sum(CASE WHEN contains(text, 'dup') THEN 1 ELSE 0 END)
        |             / count(*)::DOUBLE, 6) AS pos_rate
        |FROM documents
        |GROUP BY 1
        |ORDER BY bin""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(least(floor(col("n_chars") / 100), lit(5L)).as("bin"),
          when(col("text").contains("dup"), 1L).otherwise(0L).as("y"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum("y").as("n_pos"),
          round(sum("y") / count(lit(1)).cast("double"), 6).as("pos_rate"))
        .orderBy("bin")
    },

    // Cohen's kappa — chance-corrected agreement between two deterministic
    // labelers (a length rule and a repetition rule), the label-quality
    // number an annotation pipeline reports per batch. One narrow pass
    // builds the 2×2 confusion counts (map-side combined); kappa follows
    // from exact integers in ONE parenthesization — (po − pe) / (1 − pe)
    // with po, pe exact-integer ratios — so both engines agree to the
    // rounded digit. Output keeps the confusion cells so the gate pins
    // the whole table, not just the statistic.
    QueryDef.sql(
      "q187_cohens_kappa",
      """WITH l AS (SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ra,
        |                  CASE WHEN len(string_split(text, ' '))
        |                       - len(list_distinct(string_split(text, ' ')))
        |                       >= 30 THEN 1 ELSE 0 END AS rb
        |           FROM documents),
        |     c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |                  CAST(sum(ra * rb) AS BIGINT) AS n11,
        |                  CAST(sum(ra * (1 - rb)) AS BIGINT) AS n10,
        |                  CAST(sum((1 - ra) * rb) AS BIGINT) AS n01,
        |                  CAST(sum((1 - ra) * (1 - rb)) AS BIGINT) AS n00
        |           FROM l)
        |SELECT n, n11, n10, n01, n00,
        |       round(((n11 + n00) / CAST(n AS DOUBLE)
        |              - ((n11 + n10) * CAST(n11 + n01 AS DOUBLE)
        |                 + (n01 + n00) * CAST(n10 + n00 AS DOUBLE)) / (CAST(n AS DOUBLE) * n))
        |             / (1 - ((n11 + n10) * CAST(n11 + n01 AS DOUBLE)
        |                 + (n01 + n00) * CAST(n10 + n00 AS DOUBLE)) / (CAST(n AS DOUBLE) * n)),
        |             6) AS kappa
        |FROM c""".stripMargin) { (s, d) =>
      val l2 = t(s, d, "documents")
        .select(col("n_chars"), split(col("text"), " ").as("w"))
        .select(when(col("n_chars") >= 300, 1L).otherwise(0L).as("ra"),
          when(size(col("w")) - size(array_distinct(col("w"))) >= 30, 1L)
            .otherwise(0L).as("rb"))
      val c = l2.agg(count(lit(1)).as("n"),
        sum(col("ra") * col("rb")).as("n11"),
        sum(col("ra") * (lit(1L) - col("rb"))).as("n10"),
        sum((lit(1L) - col("ra")) * col("rb")).as("n01"),
        sum((lit(1L) - col("ra")) * (lit(1L) - col("rb"))).as("n00"))
      // identical parenthesization to the oracle: po − pe over 1 − pe
      val nD = col("n").cast("double")
      val pe = ((col("n11") + col("n10")) * (col("n11") + col("n01")).cast("double")
        + (col("n01") + col("n00")) * (col("n10") + col("n00")).cast("double")) / (nD * col("n"))
      c.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        round(((col("n11") + col("n00")) / nD - pe) / (lit(1) - pe), 6)
          .as("kappa"))
    },

    // NDCG@10 — the graded-relevance retrieval metric the AUC/p@k pair
    // above can't express (position-discounted, non-binary gains): rank
    // candidates per query by exact inner product, grade relevance from
    // label agreement (grades 3/2/1 → gains 7/3/1), and normalize by the
    // ideal ordering of the SAME candidate pool. Both the realized DCG
    // and the ideal DCG are exact BIGINT dot products against the
    // 1e10-scaled discount literals in [[ndcgW]] (no transcendental at
    // query time, partition-order-free); the single division DCG/IDCG is
    // the only double op, so 6 dp agrees bit-for-bit. Scale: queries are
    // a broadcast-able 1/97 slice; the corpus streams ONCE through the
    // bounded-buffer top-k aggregate (kilobytes per query cross the
    // shuffle, the q283 shape) and once through the grade-count
    // aggregate; the ideal ranking is NEVER materialized — position i's
    // grade comes from the count ladder in [[idcgIntSql]].
    QueryDef.sql(
      "q296_ndcg",
      s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe,
        |                  label AS ql
        |           FROM embeddings WHERE vec_id % 97 = 0),
        |c AS (SELECT q.qid, q.ql, e.vec_id, e.label,
        |             list_inner_product(CAST(e.embedding AS DOUBLE[]), q.qe) AS c
        |      FROM q JOIN embeddings e ON e.vec_id <> q.qid),
        |g AS (SELECT qid, ql, vec_id, label, c,
        |             CASE WHEN label = ql THEN 3 - (vec_id % 3) ELSE 0 END AS rel
        |      FROM c),
        |cc AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_cand,
        |              CAST(count(CASE WHEN rel = 3 THEN 1 END) AS BIGINT) AS n3,
        |              CAST(count(CASE WHEN rel = 2 THEN 1 END) AS BIGINT) AS n2,
        |              CAST(count(CASE WHEN rel = 1 THEN 1 END) AS BIGINT) AS n1
        |       FROM g GROUP BY qid),
        |top AS (SELECT qid, rel,
        |               row_number() OVER (PARTITION BY qid
        |                                  ORDER BY c DESC, vec_id) AS rank
        |        FROM g QUALIFY rank <= 10),
        |dc AS (SELECT qid,
        |              CAST(sum((CASE rel WHEN 3 THEN 7 WHEN 2 THEN 3
        |                        WHEN 1 THEN 1 ELSE 0 END)
        |                       * [${ndcgW.mkString(", ")}][rank]) AS BIGINT)
        |                AS dcg_int
        |       FROM top GROUP BY qid)
        |SELECT cc.qid, cc.n_cand, cc.n3 + cc.n2 + cc.n1 AS n_rel,
        |       round(CAST(dc.dcg_int AS DOUBLE) / 1e10, 6) AS dcg10,
        |       round(CAST($idcgIntSql AS DOUBLE) / 1e10, 6) AS idcg10,
        |       CASE WHEN $idcgIntSql > 0
        |            THEN round(CAST(dc.dcg_int AS DOUBLE) / $idcgIntSql, 6)
        |            ELSE 0.0 END AS ndcg10
        |FROM cc JOIN dc USING (qid)
        |ORDER BY qid""".stripMargin) { (s, d) =>
      val e = t(s, d, "embeddings")
      val q = e.filter(pmod(col("vec_id"), lit(97L)) === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("label").as("ql"))
      val rel = when(col("label") === col("ql"),
        lit(3) - (col("vec_id") % 3).cast("int")).otherwise(0).as("rel")
      val scored = broadcast(q).join(e, col("vec_id") =!= col("qid"))
        .select(col("qid"), col("ql"), col("vec_id"), col("label"),
          graft.functions.VectorFunctions
            .innerProductFast(col("embedding"), col("qe")).as("c"))
      val graded = scored.select(col("qid"), col("vec_id"), col("c"), rel)
        .localCheckpoint(true) // feeds both the top-k and the count ladder
      val cc = graded.groupBy("qid").agg(count(lit(1)).as("n_cand"),
        count(when(col("rel") === 3, 1)).as("n3"),
        count(when(col("rel") === 2, 1)).as("n2"),
        count(when(col("rel") === 1, 1)).as("n1"))
      val wArr = array(ndcgW.map(lit): _*)
      val dc = SimilarityQueries.groupedTopK(graded, 10)
        .join(graded.select(col("qid").as("gq"), col("vec_id").as("gv"),
          col("rel")), col("qid") === col("gq") && col("vec_id") === col("gv"))
        .select(col("qid"),
          (when(col("rel") === 3, 7L).when(col("rel") === 2, 3L)
            .when(col("rel") === 1, 1L).otherwise(0L)
            * element_at(wArr, col("rank"))).as("t"))
        .groupBy("qid").agg(sum("t").as("dcg_int"))
      cc.join(dc, "qid")
        .selectExpr("qid", "n_cand", "n3 + n2 + n1 AS n_rel",
          "round(CAST(dcg_int AS DOUBLE) / 1e10, 6) AS dcg10",
          s"round(CAST($idcgIntSql AS DOUBLE) / 1e10, 6) AS idcg10",
          s"CASE WHEN $idcgIntSql > 0 " +
            s"THEN round(CAST(dcg_int AS DOUBLE) / $idcgIntSql, 6) " +
            "ELSE 0.0 END AS ndcg10")
        .orderBy("qid")
    },

    // Isotonic (monotone) calibration of q145's reliability profile —
    // the PAVA fit every production score calibrator applies before the
    // raw bin rates are trusted; the fitted column is what q145's
    // pos_rate SHOULD read if the score were honest. Instead of
    // iterating pool-adjacent-violators (a data-dependent loop), the fit
    // uses the exact minimax identity fit_i = max_{j≤i} min_{k≥i}
    // pooled-rate(j..k): with ≤6 bins the (j,i,k) enumeration is a
    // constant-size, WINDOW-FREE triple join over the bin frame. Pooled
    // rates are single divisions of exact integers (bit-identical
    // doubles), so min/max order identically in both engines.
    QueryDef.sql(
      "q320_isotonic_calibration",
      """WITH base AS (
        |  SELECT least(n_chars // 100, 5) AS b,
        |         CASE WHEN contains(text, 'dup') THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |bins AS (SELECT b, CAST(count(*) AS BIGINT) AS n,
        |                CAST(sum(y) AS BIGINT) AS c
        |         FROM base GROUP BY 1),
        |aa AS (SELECT j.b AS j, k.b AS k,
        |              CAST(sum(bn.c) AS DOUBLE) / sum(bn.n) AS a
        |       FROM bins j JOIN bins k ON k.b >= j.b
        |            JOIN bins bn ON bn.b BETWEEN j.b AND k.b
        |       GROUP BY 1, 2),
        |mi AS (SELECT i.b AS i, aa.j, min(aa.a) AS mn
        |       FROM bins i JOIN aa ON aa.j <= i.b AND aa.k >= i.b
        |       GROUP BY 1, 2),
        |ft AS (SELECT i, max(mn) AS fit FROM mi GROUP BY 1)
        |SELECT bins.b AS bin, bins.n AS n_docs,
        |       round(CAST(bins.c AS DOUBLE) / bins.n, 6) AS obs_rate,
        |       round(ft.fit, 6) AS iso_fit
        |FROM bins JOIN ft ON bins.b = ft.i
        |ORDER BY bin""".stripMargin) { (s, d) =>
      val bins = t(s, d, "documents")
        .select(least(floor(col("n_chars") / 100), lit(5L)).as("b"),
          when(col("text").contains("dup"), 1L).otherwise(0L).as("y"))
        .groupBy("b")
        .agg(count(lit(1)).as("n"), sum("y").as("c"))
        .localCheckpoint(true) // ≤6 rows; joined from 4 places
      bins.join(broadcast(isotonicFit(bins)), col("b") === col("i"))
        .select(col("b").as("bin"), col("n").as("n_docs"),
          round(col("c").cast("double") / col("n"), 6).as("obs_rate"),
          round(col("fit"), 6).as("iso_fit"))
        .orderBy("bin")
    }
  )
}
