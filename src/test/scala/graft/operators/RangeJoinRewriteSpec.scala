package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The injected optimizer rule (graftx.RangeJoinRewrite) must (1) turn a
  * raw point-in-interval non-equi join into a bucketed equi-join, (2) be
  * exactly result-equivalent to the nested-loop plan it replaces for every
  * bound-operator combination and for negative (pre-1970) values, and
  * (3) leave hash-joinable (equi) joins alone.
  */
class RangeJoinRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Width = "spark.graft.rangeJoin.bucketWidth"

  // intervals of mixed lengths incl. negative coordinates; points dense
  private lazy val intervals = (-20L to 200L by 7L).zipWithIndex
    .map { case (lo, i) => (i.toLong, lo, lo + 3 + (i % 11)) }
    .toDF("iid", "lo", "hi")
  private lazy val points = (-30L to 220L).map(p => (p + 1000, p))
    .toDF("pid", "p")

  private def withWidth[A](w: Long)(f: => A): A = {
    graft.Graft.ensureConfigured(spark)
    spark.conf.set(Width, w.toString)
    try f finally spark.conf.set(Width, "0")
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("raw non-equi interval join plans as a bucketed equi-join, results exact") {
    val cond = col("lo") < col("p") && col("p") <= col("hi")
    val baseline = points.join(intervals, cond)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(baseline.nonEmpty)
    withWidth(8L) {
      val df = points.join(intervals, cond).select("pid", "iid")
      val p = planOf(df)
      assert(p.contains("graft_range_bucket"),
        s"rewrite must introduce the bucket key:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"no nested loop may remain:\n$p")
      assert(df.as[(Long, Long)].collect().toSet == baseline)
    }
  }

  test("every bound-operator combination is exact (incl. negative coords)") {
    val conds = Seq(
      col("lo") < col("p") && col("p") <= col("hi"),
      col("lo") <= col("p") && col("p") < col("hi"),
      col("p") > col("lo") && col("hi") >= col("p"),
      col("p") >= col("lo") && col("p") <= col("hi"))
    conds.zipWithIndex.foreach { case (cond, i) =>
      val baseline = points.join(intervals, cond)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      withWidth(5L) {
        val got = points.join(intervals, cond)
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        assert(got == baseline, s"combo $i differs: " +
          s"missing=${(baseline -- got).take(5)} extra=${(got -- baseline).take(5)}")
      }
    }
  }

  test("joins with an equi conjunct are left untouched") {
    withWidth(8L) {
      val df = points.join(intervals,
        col("pid") % 31 === col("iid") && col("lo") < col("p"))
      val p = planOf(df)
      assert(!p.contains("graft_range_bucket"),
        s"equi-joinable join must not be rewritten:\n$p")
    }
  }

  test("rule is inert with the width conf unset") {
    graft.Graft.ensureConfigured(spark)
    val p = planOf(points.join(intervals,
      col("lo") < col("p") && col("p") <= col("hi")))
    assert(!p.contains("graft_range_bucket"),
      s"default-off: no rewrite without the conf:\n$p")
  }
}
