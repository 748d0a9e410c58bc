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
}
