package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** HLL sketch properties q75 relies on: bounded relative error, and the
  * merge identity that makes sketches the scale path — the union of
  * per-slice sketches must estimate exactly what one pass over the whole
  * data estimates (same registers, same hash), so pre-aggregated slices
  * compose without rescans. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hll union of per-group sketches == direct global sketch, estimate within 5% of exact") {
    val df = (1 to 20000)
      .map(i => (i % 7, (i * 2654435761L) % 9973))  // ~9973 distinct values
      .toDF("g", "v")
    val direct = df.agg(expr("hll_sketch_estimate(hll_sketch_agg(v, 12))")
      .as("e")).as[Double].head()
    val merged = df.groupBy("g").agg(expr("hll_sketch_agg(v, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e"))
      .as[Double].head()
    assert(merged == direct, "sketch merge must be lossless vs one-pass")
    val exact = df.select(countDistinct($"v")).as[Long].head()
    assert(math.abs(direct - exact) / exact < 0.05,
      s"estimate $direct vs exact $exact out of 5% bound")
  }

  test("approx_top_k accumulate/combine across slices == exact counts when capacity suffices") {
    val df = (1 to 9000).map(i => (i % 5, s"tok${i % 37}")).toDF("slice", "tok")
    // two-level: per-slice sketch states, combined, then estimated — the
    // shape a 1000-executor aggregation takes
    val merged = df.groupBy("slice")
      .agg(expr("approx_top_k_accumulate(tok, 100)").as("st"))
      .agg(expr("approx_top_k_estimate(approx_top_k_combine(st, 100), 100)")
        .as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item".as("tok"), $"e.count".as("cnt"))
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("tok").count().as[(String, Long)].collect().toMap
    assert(merged == exact, "capacity>distinct must make the sketch exact")
  }

  test("theta sketch beyond the exact threshold still bounds intersection error") {
    val a = (0 until 100000).map(i => Tuple1(i.toLong)).toDF("v")
      .agg(expr("theta_sketch_agg(v)").as("s"))
    val b = (60000 until 160000).map(i => Tuple1(i.toLong)).toDF("v")
      .agg(expr("theta_sketch_agg(v)").as("s"))
    val est = a.crossJoin(b.withColumnRenamed("s", "s2"))
      .select(expr("theta_sketch_estimate(theta_intersection(s, s2))")
        .cast("double").as("e")).as[Double].head()
    assert(math.abs(est - 40000) / 40000 < 0.1,
      s"intersection estimate $est vs true 40000 out of 10% bound")
  }

  test("CMS under forced collisions: never underestimates, min-depth tightens") {
    // q175's gate corpus has a vocab small enough that its 4x1024 sketch
    // is collision-free (measured overestimate 0) — so the one-sided-error
    // contract is pinned here on an ADVERSARIAL shape instead: 500 words
    // into width 16 forces ~31 words per counter. Zipf-ish counts.
    val wc = (1 to 500).map(i => (s"w$i", (1000L / i).max(1L)))
      .toDF("word", "cnt")
    val est = CorpusQueries.cmsEstimates(wc, depth = 4, width = 16)
      .select($"word", $"cnt", $"est").as[(String, Long, Long)].collect()
    assert(est.length == 500, "an estimate per word")
    assert(est.forall { case (_, cnt, e) => e >= cnt },
      "CMS must NEVER underestimate (each counter contains the word's own count)")
    // depth must help: the 4-depth min estimate is no worse than depth 1
    val est1 = CorpusQueries.cmsEstimates(wc, depth = 1, width = 16)
      .select($"word", $"est").as[(String, Long)].collect().toMap
    assert(est.forall { case (w, _, e) => e <= est1(w) },
      "min over 4 depths must be <= the single-depth estimate")
    val n = wc.agg(sum($"cnt")).as[Long].head()
    val maxOver = est.map { case (_, cnt, e) => e - cnt }.max
    assert(maxOver > 0, "width 16 must actually force collisions")
    assert(maxOver <= n, s"overestimate $maxOver cannot exceed total mass $n")
  }
}
