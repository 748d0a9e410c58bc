package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{AsOfJoinDsl, AsOfJoinExec}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the native sort-merge as-of join (graftx.AsOfJoinExec) against the
  * composed union+window form on randomized data, plus the plan shape and
  * the left-outer null contract. */
class AsOfJoinExecSpec extends AnyFunSuite {
  lazy val spark = { graft.Graft.configure(SparkTestSession.spark) }

  private def randomSides(seed: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // ~40 keys, colliding timestamps on purpose (tiebreak must decide)
    val left = (0 until 400).map(i =>
      (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(50).toLong))
      .toDF("l_id", "k", "t")
    val right = (0 until 300).map(i =>
      (1000L + i, rnd.nextInt(40).toLong, rnd.nextInt(50).toLong,
        rnd.nextInt(1000).toLong))
      .toDF("r_id", "rk", "rt", "payload")
    (left, right)
  }

  test("exec output equals the composed union+window form") {
    val (left, right) = randomSides(17L)
    val native = AsOfJoinDsl.joinPrior(left, right,
        leftKey = "k", rightKey = "rk", leftTs = "t", rightTs = "rt",
        rightTiebreak = "r_id")
      .select(col("l_id"), col("r_id").as("prior_r_id"))
    val composed = graft.queries.AsOfJoin.joinPrior(
        left, right.withColumnRenamed("rk", "k").withColumnRenamed("rt", "t2")
          .select(col("k"), col("t2"), col("r_id")),
        key = "k", tsLeft = "t", tsRight = "t2", tiebreak = col("r_id"))
      .select(col("l_id"), col("prior_r_id"))
    val n = native.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val c = composed.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(n.size == 400 && n == c)
  }

  test("matches a driver-side brute force, including unmatched-left nulls") {
    val (left, right) = randomSides(99L)
    val rs = right.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = left.collect().map { r =>
      val (lid, k, t) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val best = rs.filter(x => x._2 == k && x._3 <= t)
        .sortBy(x => (x._3, x._1)).lastOption
      lid -> best.map(_._1).getOrElse(-1L)
    }.toMap
    val got = AsOfJoinDsl.joinPrior(left, right,
        leftKey = "k", rightKey = "rk", leftTs = "t", rightTs = "rt",
        rightTiebreak = "r_id")
      .select(col("l_id"), col("r_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == want)
    assert(want.values.exists(_ == -1L), "fixture must exercise the outer side")
  }

  test("plans as AsOfJoinExec — no window, no union in the physical plan") {
    val (left, right) = randomSides(5L)
    val df = AsOfJoinDsl.joinPrior(left, right,
      leftKey = "k", rightKey = "rk", leftTs = "t", rightTs = "rt",
      rightTiebreak = "r_id")
    df.collect() // materialize so AQE finalizes the plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"native exec expected:\n$p")
    assert(!p.contains("Window") && !p.contains("Union"), p)
    // AQE hides plans behind leaf wrappers (AdaptiveSparkPlanExec holds the
    // final plan as a field; QueryStageExec wraps its stage plan the same
    // way), so a plain children traversal never reaches the exec — recurse
    // through the wrappers explicitly
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def hasExec(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case _: AsOfJoinExec => true
      case a: AdaptiveSparkPlanExec => hasExec(a.executedPlan)
      case q: QueryStageExec => hasExec(q.plan)
      case other => other.children.exists(hasExec)
    }
    assert(hasExec(df.queryExecution.executedPlan),
      df.queryExecution.executedPlan.toString)
  }

  test("mismatched key or time types fail at construction, not mid-job") {
    import spark.implicits._
    val l = Seq((1, 1L)).toDF("k", "t")
    val r = Seq((1L, 1L, 1L)).toDF("rk", "rt", "r_id") // rk LONG vs k INT
    val e = intercept[IllegalArgumentException] {
      AsOfJoinDsl.joinPrior(l, r, "k", "rk", "t", "rt", "r_id")
    }
    assert(e.getMessage.contains("key types differ"), e.getMessage)
  }

  test("child sorts are partition-local; exchanges are hash co-partitioning") {
    // the 100 TB failure mode this guards against: a global (range) sort of
    // either side. EnsureRequirements must satisfy the exec's contracts
    // with hash exchanges + LOCAL sorts only — the SMJ shape.
    val (left, right) = randomSides(23L)
    val df = AsOfJoinDsl.joinPrior(left, right,
      leftKey = "k", rightKey = "rk", leftTs = "t", rightTs = "rt",
      rightTiebreak = "r_id")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(k#") && p.contains("hashpartitioning(rk#"),
      s"both sides must hash-cluster on their key:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"no global sort exchange anywhere:\n$p")
    // every Sort node is local: 'Sort [...], false, 0' (global=false)
    val sortLines = p.linesIterator.filter(_.contains("Sort [")).toSeq
    assert(sortLines.nonEmpty && sortLines.forall(_.contains("false, 0")),
      s"all sorts must be partition-local:\n$p")
  }
}
