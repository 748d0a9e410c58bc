package graft.queries

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
    }
  )
}
