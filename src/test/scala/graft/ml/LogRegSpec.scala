package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins [[LogReg]] on a linearly separable corpus (disjoint class
  * vocabularies): training must drive the log-loss well below the ln 2 of
  * the zero model and classify its own training set almost perfectly — and
  * the real-corpus q128 query must actually separate English. */
class LogRegSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val nF = 256

  private lazy val feats = {
    import spark.implicits._
    val rnd = new scala.util.Random(3L)
    val docs = (0 until 200).map { id =>
      val y = id % 2
      val vocab = if (y == 1) (0 until 20).map(i => s"pos$i")
                  else (0 until 20).map(i => s"neg$i")
      val text = Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (id.toLong, text, y)
    }.toDF("doc_id", "text", "y")
    LogReg.featurize(docs, col("text"), col("y"), nF, col("doc_id")).cache()
  }

  test("gradient descent reduces log-loss from the zero model") {
    val w = LogReg.train(feats, nF, iters = 10, lr = 2.0)
    val loss = LogReg.logLoss(feats, w)
    assert(loss < 0.4, s"loss after training = $loss (zero model = ${math.log(2)})")
  }

  test("separable classes are classified almost perfectly") {
    val w = LogReg.train(feats, nF, iters = 10, lr = 2.0)
    val acc = feats
      .select((((LogReg.score(w, col("feats")) >= 0.5).cast("int") === col("y"))
        .cast("int")).as("hit"))
      .agg(avg("hit")).head().getDouble(0)
    assert(acc >= 0.95, s"training accuracy = $acc")
  }

  test("q128 separates the planted quality classes on the corpus") {
    // bound-oracle shape: (label, n_docs exact, acc_ok = per-class
    // training accuracy >= 0.9 pinned TRUE)
    val rows = graft.SparkEntry.queries("q128_quality_classifier")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getInt(0)).toSet == Set(0, 1))
    assert(rows.map(_.getLong(1)).sum > 0)
    assert(rows.forall(_.getBoolean(2)),
      s"per-class accuracy flag: ${rows.mkString(", ")}")
  }
}
