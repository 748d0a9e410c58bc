package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic regression over hashed bag-of-words features — the
  * fasttext-style quality/domain classifier a training-data pipeline fits on
  * a labeled slice and then applies to the whole corpus (the quality-filter
  * model of the CCNet/GPT-3 lineage: train a small linear model, score
  * everything, keep the top slice).
  *
  * Shape at 100 TB: the model (`nFeatures` doubles) is the only driver-side
  * state. Each full-batch GD iteration is ONE distributed pass: margins are
  * a per-row array fold against the broadcast-literal weight vector (no
  * shuffle, whole-stage codegen), and the gradient is a map-side-combined
  * groupBy over exploded (feature, g·v) pairs — ≤ `nFeatures` rows cross the
  * shuffle per task regardless of corpus size. The featurized corpus is
  * built once and cached; iterations never re-tokenize.
  *
  * Everything is `functions._` composition — no UDF anywhere, so the scoring
  * path (a fold + sigmoid) inlines into whole-stage codegen both during
  * training and at corpus-scoring time.
  */
object LogReg {

  /** Hashed set-of-words featurization: one row per document with a sparse
    * feature array `feats: array<struct<idx int, v double>>` — binary
    * presence over `nFeatures` xxhash64 buckets (unit feature scale keeps
    * the gradient well-conditioned; tf-scaled variants push every value
    * toward 1/n_tokens and stall full-batch GD) — and the double label `y`.
    *
    * Entirely row-local (tokenize → hash → dedupe → sort inside one
    * `transform` chain): zero shuffles, and a document with NO tokens keeps
    * its row with an empty feature array (margin 0 → σ = 0.5) instead of
    * silently vanishing from training counts and scoring — the bug an
    * explode+groupBy formulation has. */
  def featurize(docs: DataFrame, textCol: Column, label: Column,
      nFeatures: Int, idCol: Column): DataFrame =
    docs.select(idCol.as("doc_id"), label.cast("double").as("y"),
      transform(
        sort_array(array_distinct(transform(
          filter(split(lower(textCol), "\\s+"), w => w =!= ""),
          w => pmod(xxhash64(w), lit(nFeatures.toLong)).cast("int")))),
        i => struct(i.as("idx"), lit(1.0).as("v"))).as("feats"))

  /** σ(margin) under the weight literal `w`: a single left-to-right fold
    * over the sparse features — narrow, codegen'd, shuffle-free. */
  def score(w: Array[Double], feats: Column): Column = {
    val wLit = array(w.map(lit(_)).toIndexedSeq: _*)
    val margin = aggregate(feats, lit(0.0),
      (acc, e) => acc + e.getField("v") * element_at(wLit, e.getField("idx") + 1))
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /** Full-batch gradient descent: `iters` passes, each margin-fold +
    * per-feature gradient aggregation. `featurized` should be cached by the
    * caller (it is re-scanned every iteration). */
  def train(featurized: DataFrame, nFeatures: Int, iters: Int,
      lr: Double, l2: Double = 1e-4): Array[Double] = {
    val n = featurized.count().toDouble
    val w = new Array[Double](nFeatures)
    for (_ <- 0 until iters) {
      val g = featurized
        .select(col("feats"), (score(w, col("feats")) - col("y")).as("g"))
        .select(explode(col("feats")).as("e"), col("g"))
        .groupBy(col("e.idx").as("idx"))
        .agg(sum(col("g") * col("e.v")).as("grad"))
        .collect()
      val grad = new Array[Double](nFeatures)
      // MEAN gradient — a sum-scaled step diverges at any fixed lr once the
      // corpus grows (the whole point is corpus-size-independent tuning)
      g.foreach(r => grad(r.getInt(0)) = r.getDouble(1) / n)
      var i = 0
      while (i < nFeatures) { w(i) -= lr * (grad(i) + l2 * w(i)); i += 1 }
    }
    w
  }

  /** Mean log-loss of the current weights — the training-progress metric
    * (one aggregation pass; clamped away from log 0). */
  def logLoss(featurized: DataFrame, w: Array[Double]): Double = {
    val p = score(w, col("feats"))
    val eps = 1e-12
    featurized
      .select(avg(-(col("y") * log(greatest(p, lit(eps)))
        + (lit(1.0) - col("y")) * log(greatest(lit(1.0) - p, lit(eps)))))
        .as("loss"))
      .head().getDouble(0)
  }
}
