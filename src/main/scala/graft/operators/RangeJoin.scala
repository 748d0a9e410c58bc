package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join as a bucketed equi-join — the operator Spark's
  * built-in join strategies lack a fast path for.
  *
  * A naive `a JOIN b ON p > lo AND p <= hi` has no equi-key, so Catalyst
  * can only plan a broadcast/cartesian nested-loop — O(|a|·|b|) compares,
  * unusable at scale. The standard distributed rewrite (used by every
  * warehouse engine's interval join): quantize the range dimension into
  * fixed-width buckets, expand each interval to the bucket ids it covers,
  * equi-join points to intervals on bucket id, then re-check the exact
  * predicate. Each (interval, point) pair meets in exactly ONE bucket (the
  * point's own), so no dedup pass is needed.
  *
  * Scale shape: the equi-join shuffles both sides on bucket id — partial
  * aggregation, AQE skew handling, and broadcast (when the interval side is
  * small) all apply as with any equi-join. Expansion factor per interval is
  * `len/bucketWidth + 1`, so pick bucketWidth on the order of the typical
  * interval length.
  *
  * The reference has no range join (its only join is the per-record geocode
  * lookup, hello.py:43); this generalizes the same bucket-and-refine idea
  * GeoDim uses for nearest-place lookup to 1-D intervals.
  */
object RangeJoin {

  /** Inner join of `points` into `intervals` on `lo < point <= hi`
    * (half-open, so back-to-back intervals never double-count a boundary
    * point). `loCol`/`hiCol` name LONG columns of `intervals`; `pointCol` a
    * LONG column of `points`; all three in the same unit (e.g. epoch
    * micros). Output: all columns of both inputs.
    */
  def pointInInterval(
      intervals: DataFrame, loCol: String, hiCol: String,
      points: DataFrame, pointCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val bkt = "graft_range_bucket"
    // Exact integer floorDiv — (c - pmod(c, w)) / w. Not double division
    // (inexact near bucket edges ⇒ a point and its interval could land in
    // different buckets and silently miss), and not `div` (truncates toward
    // zero, misbucketing pre-1970 epochs).
    def bucketOf(c: Column): Column =
      ((c - pmod(c, lit(bucketWidth))) / lit(bucketWidth)).cast("long")
    val left = intervals.withColumn(
      bkt, explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    val right = points.withColumn(bkt, bucketOf(col(pointCol)))
    left.join(right, Seq(bkt))
      .where(col(pointCol) > col(loCol) && col(pointCol) <= col(hiCol))
      .drop(bkt)
  }
}
