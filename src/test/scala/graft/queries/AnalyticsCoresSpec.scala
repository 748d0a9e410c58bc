package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Pins the round-10 analytics cores on handcrafted inputs:
  *
  *   - [[EvalQueries.isotonicFit]] — the window-free minimax identity must
  *     equal hand-run PAVA (pool-adjacent-violators), be monotone, and
  *     preserve already-monotone profiles untouched;
  *   - [[SimilarityQueries.kcenterPicks]] — greedy farthest-point must
  *     elect the known sequence on a planted geometry and its covering
  *     radius must be non-increasing (the Gonzalez invariant);
  *   - [[Events.absorb]] — exact-state absorption must hit the closed-form
  *     answers of a chain simple enough to solve by hand, and removal must
  *     zero the conversion when the removed channel is the only path.
  */
class AnalyticsCoresSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("isotonicFit equals hand-run PAVA on a non-monotone profile") {
    import spark.implicits._
    // bins (b, n, c): rates 0.2, 0.6, 0.3, 0.8 — PAVA pools bins 1,2
    // (weighted: (6+3)/(10+10)=0.45) and leaves 0.2 and 0.8 alone
    val bins = Seq((0L, 10L, 2L), (1L, 10L, 6L), (2L, 10L, 3L),
      (3L, 10L, 8L)).toDF("b", "n", "c")
    val fit = EvalQueries.isotonicFit(bins)
      .orderBy("i").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(fit.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    val vals = fit.map(_._2)
    assert(math.abs(vals(0) - 0.2) < 1e-12)
    assert(math.abs(vals(1) - 0.45) < 1e-12)
    assert(math.abs(vals(2) - 0.45) < 1e-12)
    assert(math.abs(vals(3) - 0.8) < 1e-12)
    assert(vals.sliding(2).forall(p => p(0) <= p(1) + 1e-12), "monotone")
    // weighted-mean preservation: sum(n_i * fit_i) == sum(c_i)
    assert(math.abs(vals.map(_ * 10).sum - 19.0) < 1e-9)
  }

  test("isotonicFit is the identity on an already-monotone profile") {
    import spark.implicits._
    val bins = Seq((0L, 5L, 1L), (1L, 5L, 2L), (2L, 5L, 4L))
      .toDF("b", "n", "c")
    val fit = EvalQueries.isotonicFit(bins)
      .orderBy("i").collect().map(_.getDouble(1))
    assert(fit.zip(Seq(0.2, 0.4, 0.8))
      .forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("kcenterPicks elects the farthest-point sequence; radius non-increasing") {
    import spark.implicits._
    // 1-D planted geometry (i=0 only): positions 0, 1, 10, 100 in 1e-6
    // units. Seed = min vec_id (pos 0); then 100, then 10, then 1.
    val el = Seq((1L, 0, 0L), (2L, 0, 1L), (3L, 0, 10L), (4L, 0, 100L))
      .toDF("vec_id", "i", "xq")
    val picks = SimilarityQueries.kcenterPicks(el, 4)
    assert(picks.map(_._2) == Seq(1L, 4L, 3L, 2L))
    val radii = picks.flatMap(_._3)
    assert(radii == Seq(100L * 100L, 10L * 10L, 1L))
    assert(radii.sliding(2).forall(p => p(0) >= p(1)),
      "Gonzalez covering radius must be non-increasing")
  }

  test("absorb matches the closed-form chain and zeroes a severed path") {
    // Chain: START -> a (always), a -> CONV (always). Quantized exactly.
    val pb = Array(("START", "a", 1000000000L), ("a", "CONV", 1000000000L),
      ("CONV", "CONV", 1000000000L), ("NULL", "NULL", 1000000000L))
    // base: all mass converts (1e8 in state units)
    assert(Events.absorb(pb, "none") == 100000000L)
    // removing the only channel redirects START's mass to NULL
    assert(Events.absorb(pb, "a") == 0L)
    // 50/50 split: START -> a | b; a -> CONV, b -> NULL. Removing b
    // cannot change CONV mass (b never converted); removing a halves it
    // to zero.
    val pb2 = Array(("START", "a", 500000000L), ("START", "b", 500000000L),
      ("a", "CONV", 1000000000L), ("b", "NULL", 1000000000L),
      ("CONV", "CONV", 1000000000L), ("NULL", "NULL", 1000000000L))
    assert(Events.absorb(pb2, "none") == 50000000L)
    assert(Events.absorb(pb2, "b") == 50000000L)
    assert(Events.absorb(pb2, "a") == 0L)
  }
}
