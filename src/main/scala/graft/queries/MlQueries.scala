package graft.queries

import org.apache.spark.sql.functions._
import graft.ml.{LogReg, Pca}

/** Model-fitting operators exposed as judge-facing queries: PCA projection
  * of the embedding corpus (q127) and a hashed-feature logistic-regression
  * quality classifier (q128). Both are iterative fits whose only driver
  * state is the model itself; neither is SQL-expressible, so both are
  * rows-only in the driver gate and pinned by PcaSpec / LogRegSpec
  * (residual-, variance- and accuracy-based assertions on clustered /
  * labeled corpora).
  */
object MlQueries {

  val defs: Seq[QueryDef] = Seq(

    // PCA: fit top-2 components on the embedding corpus (one distributed
    // moment pass + driver eigen-solve on the 64×64 covariance), project
    // every vector. The classic pre-step before product quantization (q117)
    // — PQ sub-spaces want decorrelated coordinates.
    QueryDef.rowsOnly("q127_pca_project") { (s, d) =>
      val e = t(s, d, "embeddings")
      val model = Pca.fit(e, "embedding", dim = 64, k = 2)
      e.select(col("vec_id"), col("label"),
          round(Pca.projection(model, 0, col("embedding")), 4).as("pc1"),
          round(Pca.projection(model, 1, col("embedding")), 4).as("pc2"))
        .orderBy("vec_id")
    },

    // Quality classifier: fasttext-style filter — learn a curation label
    // from hashed bag-of-words (512 xxhash64 buckets, 12 full-batch GD
    // rounds), score the corpus, report the per-class decision profile.
    //
    // The synthetic corpus is a word salad with NO native lexical signal
    // (every word appears in every lang/source at the base rate), so the
    // label is planted: even/odd doc_id halves get "high-quality" vs
    // "spam" stylistic markers appended — the same make-it-non-vacuous
    // injection discipline as q83's edit variants and q90's noisy copies
    // (the split is doc_id parity, not a hash, precisely so the oracle
    // can recompute the label frame). Real corpora carry this signal
    // natively; the training machinery is identical.
    //
    // Bound oracle (the q10/q58/q75 pattern): the emitted (label, n_docs)
    // rows are exact and DuckDB-recomputable; acc_ok pins per-class
    // training accuracy ≥ 0.9 (LogRegSpec measures ≥ 0.95 on this planted
    // corpus), so a diverged fit, a broken featurizer, or a scoring bug
    // flips the flag and fails the hash gate — the iterative float fit
    // itself stays free to be non-SQL-expressible.
    QueryDef.sql(
      "q128_quality_classifier",
      """SELECT CAST(doc_id % 2 AS INT) AS label,
        |       count(*) AS n_docs,
        |       TRUE AS acc_ok
        |FROM documents
        |GROUP BY 1
        |ORDER BY label""".stripMargin) { (s, d) =>
      val isPos = col("doc_id") % 2 === 1
      val marked = t(s, d, "documents").select(col("doc_id"),
        isPos.cast("int").as("y"),
        concat(col("text"), lit(" "),
          when(isPos, lit("clean precise sourced cited edited"))
            .otherwise(lit("spam clickbait garbled junk lorem"))).as("text"))
      val feats = LogReg.featurize(marked,
        col("text"), col("y"), nFeatures = 512, idCol = col("doc_id"))
        .cache()
      try {
        val w = LogReg.train(feats, nFeatures = 512, iters = 8, lr = 2.0)
        feats
          .select(col("y").cast("int").as("label"),
            (LogReg.score(w, col("feats")) >= 0.5).as("pred"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_docs"),
            (sum(when(col("pred") === (col("label") === 1), 1L).otherwise(0L))
              >= count(lit(1)) * 0.9).as("acc_ok"))
          .orderBy("label")
      } finally feats.unpersist()
    }
  )
}
