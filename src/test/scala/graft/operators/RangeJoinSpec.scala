package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** RangeJoin must return exactly the pairs the naive non-equi join returns —
  * including points on bucket edges, intervals spanning many buckets, and
  * negative (pre-1970-style) coordinates. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def bruteForce(intervals: Seq[(Long, Long, Long)], points: Seq[(Long, Long)]) =
    (for {
      (iid, lo, hi) <- intervals
      (pid, p) <- points
      if p > lo && p <= hi
    } yield (iid, pid)).toSet

  def viaOperator(intervals: Seq[(Long, Long, Long)], points: Seq[(Long, Long)],
      width: Long): Set[(Long, Long)] = {
    val i = intervals.toDF("iid", "lo", "hi")
    val p = points.toDF("pid", "p")
    RangeJoin.pointInInterval(i, "lo", "hi", p, "p", width)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
  }

  test("random intervals/points match the naive join at several widths") {
    val rnd = new scala.util.Random(7)
    val intervals = (1L to 60L).map { iid =>
      val lo = rnd.nextInt(2000).toLong - 1000
      (iid, lo, lo + 1 + rnd.nextInt(300))
    }
    val points = (1L to 300L).map(pid => (pid, rnd.nextInt(2400).toLong - 1200))
    val want = bruteForce(intervals, points)
    assert(want.nonEmpty)
    for (w <- Seq(1L, 7L, 100L, 1000L))
      assert(viaOperator(intervals, points, w) == want, s"width=$w")
  }

  test("boundary semantics: half-open (lo, hi], edges on bucket lines") {
    val intervals = Seq((1L, 0L, 100L), (2L, 100L, 200L))
    // 0 excluded (== lo), 100 in interval 1 only, 200 in interval 2 only
    val points = Seq((10L, 0L), (11L, 100L), (12L, 200L), (13L, 201L))
    val got = viaOperator(intervals, points, 100L)
    assert(got == Set((1L, 11L), (2L, 12L)))
  }
}
