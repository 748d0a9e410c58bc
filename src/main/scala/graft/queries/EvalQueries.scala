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
    }
  )
}
