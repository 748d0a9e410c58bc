package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the tie-averaged Mann-Whitney AUC: perfect separation → 1,
  * inverted separation → 0, all-tied scores → exactly 0.5, and a hand
  * case against the closed-form pair count. */
class EvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def frame(rows: Seq[(Long, Double, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "s", "y")
  }

  test("perfectly separated scores give AUC 1, inverted give 0") {
    val sep = frame((0L until 20L).map(i =>
      (i, if (i < 10) 1.0 else 2.0, if (i < 10) 0L else 1L)))
    assert(EvalQueries.rocAuc(sep) == 1.0)
    val inv = frame((0L until 20L).map(i =>
      (i, if (i < 10) 2.0 else 1.0, if (i < 10) 0L else 1L)))
    assert(EvalQueries.rocAuc(inv) == 0.0)
  }

  test("all-tied scores give exactly 0.5 (tie averaging, any class balance)") {
    val tied = frame((0L until 30L).map(i => (i, 7.0, i % 3 min 1)))
    assert(EvalQueries.rocAuc(tied) == 0.5)
  }

  test("matches the pairwise definition on a mixed hand case") {
    // scores: pos {3, 2}, neg {2, 1}; pairs (pos > neg) = 3 of 4, tie = 1
    // AUC = (wins + 0.5*ties)/pairs = (3 + 0.5)/4 = 0.875
    val df = frame(Seq((0L, 3.0, 1L), (1L, 2.0, 1L), (2L, 2.0, 0L), (3L, 1.0, 0L)))
    assert(EvalQueries.rocAuc(df) == 0.875)
  }
}
