package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.graftx.SummaryRewrite
import graft.SparkTestSession

/** Pins the SummaryRewrite optimizer rule (materialized-view rewrite):
  * an aggregate over the registered fact scan must be answered from the
  * checkpointed summary — identical values, no fact scan in the plan —
  * for subset-key grouping and key-only filters, and must be left ALONE
  * (still correct, still scanning the fact) for anything the summary
  * cannot answer exactly. */
class SummaryRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"
  val Enable = SummaryRewrite.EnableConf

  private def withRule[T](on: Boolean)(f: => T): T = {
    graft.Graft.configure(spark)
    val prev = spark.conf.getOption(Enable)
    spark.conf.set(Enable, on.toString)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(Enable, v)
      case None => spark.conf.unset(Enable)
    }
  }

  // ONE load, cached: Tables.load re-pins every opt-in conf to false
  // (deliberately — the reset discipline), so a `def` here would undo
  // withRule(true) mid-test the moment a probe frame is constructed.
  private lazy val fact = graft.Tables.load(spark, sf, "lineitem")

  private def registerSummary(): Unit = {
    val f = fact
    val summary = f.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast(DecimalType(28, 4))).as("s_qty"),
        min("l_shipdate").as("mn_ship"),
        max("l_shipdate").as("mx_ship"))
      .localCheckpoint(true)
    SummaryRewrite.register(f, Seq("l_returnflag", "l_linestatus"),
      Seq(("count", lit(1), "cnt"),
        ("sum", col("l_quantity").cast(DecimalType(28, 4)), "s_qty"),
        ("min", col("l_shipdate"), "mn_ship"),
        ("max", col("l_shipdate"), "mx_ship")),
      summary)
  }

  private def probe = fact.groupBy("l_returnflag")
    .agg(count(lit(1)).as("n"),
      sum(col("l_quantity").cast(DecimalType(28, 4))).cast("double").as("sum_qty"),
      max(col("l_shipdate")).as("last_ship"))
    .orderBy("l_returnflag")

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan.toString

  test("subset-key aggregate rewrites to the summary with identical values") {
    try {
      registerSummary()
      val expected = withRule(on = false)(probe.collect()).map(_.toString)
      val (gotPlan, got) = withRule(on = true) {
        val df = probe
        (planOf(df), df.collect().map(_.toString))
      }
      assert(got.toSeq == expected.toSeq)
      assert(!gotPlan.contains("parquet"),
        s"rewritten plan must not scan the fact:\n$gotPlan")
      assert(gotPlan.contains("LogicalRDD") || gotPlan.contains("ExistingRDD"),
        s"rewritten plan must read the checkpointed summary:\n$gotPlan")
    } finally SummaryRewrite.clear()
  }

  test("key-only filter replays on the summary; non-key filter vetoes") {
    try {
      registerSummary()
      // defs, not vals: a Dataset caches its QueryExecution, so a frame
      // first planned with the rule off would keep that plan forever
      def filtered = fact.filter(col("l_linestatus") === "F")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
      val expected = withRule(on = false)(filtered.collect()).map(_.toString)
      withRule(on = true) {
        assert(!planOf(filtered).contains("parquet"))
        assert(filtered.collect().map(_.toString).toSeq == expected.toSeq)
      }
      // filter on a NON-key column needs fact grain: must not rewrite
      def nonKey = fact.filter(col("l_quantity") > 25)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      withRule(on = true) {
        assert(planOf(nonKey).contains("parquet"),
          "non-key filter must veto the rewrite")
      }
    } finally SummaryRewrite.clear()
  }

  test("non-derivable aggregates and distinct veto the rewrite wholesale") {
    try {
      registerSummary()
      // sum over an unregistered column
      val unregistered = fact.groupBy("l_returnflag")
        .agg(sum(col("l_extendedprice").cast(DecimalType(28, 4))).as("s"))
      // distinct cannot re-aggregate from partials
      val distinctAgg = fact.groupBy("l_returnflag")
        .agg(countDistinct("l_suppkey").as("d"))
      withRule(on = true) {
        assert(planOf(unregistered).contains("parquet"))
        assert(planOf(distinctAgg).contains("parquet"))
      }
    } finally SummaryRewrite.clear()
  }

  test("disabled flag leaves the plan untouched") {
    try {
      registerSummary()
      withRule(on = false) {
        assert(planOf(probe).contains("parquet"))
      }
    } finally SummaryRewrite.clear()
  }

  test("two rewritable aggregates in one plan both rewrite, with fresh exprIds") {
    try {
      registerSummary()
      // a self-union of two independently rewritable aggregates: each
      // substitution must mint its own summary instance (fresh exprIds via
      // MultiInstanceRelation) so composing the branches stays resolvable
      def branch = fact.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      def both = branch.unionByName(branch).orderBy("l_returnflag")
      val expected = withRule(on = false)(both.collect()).map(_.toString)
      withRule(on = true) {
        val p = planOf(both)
        assert(!p.contains("parquet"), s"both branches must rewrite:\n$p")
        assert("LogicalRDD".r.findAllIn(p).size == 2, s"two instances:\n$p")
        assert(both.collect().map(_.toString).toSeq == expected.toSeq)
      }
    } finally SummaryRewrite.clear()
  }

  test("GLOBAL count over a zero-match key filter rewrites to 0, not NULL") {
    try {
      registerSummary()
      // no GROUP BY + key-only filter matching nothing: the original plan
      // returns a single row with count=0; SUM(cnt) over the empty summary
      // selection is NULL — the rewrite must coalesce it back to 0
      def global = fact.filter(col("l_returnflag") === "NO_SUCH_FLAG")
        .agg(count(lit(1)).as("n"))
      val expected = withRule(on = false)(global.collect()).map(_.toString)
      withRule(on = true) {
        val p = planOf(global)
        assert(!p.contains("parquet"), s"global aggregate must rewrite:\n$p")
        assert(global.collect().map(_.toString).toSeq == expected.toSeq)
        assert(global.head().getLong(0) == 0L)
      }
    } finally SummaryRewrite.clear()
  }

  test("count(NULL) — foldable but nullable — vetoes the count mapping") {
    try {
      registerSummary()
      // count(NULL) is 0 by SQL semantics; mapping it to SUM(cnt) would
      // return the total row count. The foldable-child guard must require
      // non-nullable children, vetoing the rewrite wholesale.
      def nullCount = fact.groupBy("l_returnflag")
        .agg(count(lit(null)).as("n")).orderBy("l_returnflag")
      withRule(on = true) {
        assert(planOf(nullCount).contains("parquet"),
          "count(NULL) must not rewrite to SUM(cnt)")
        assert(nullCount.collect().forall(_.getLong(1) == 0L))
      }
    } finally SummaryRewrite.clear()
  }

  test("grouping by BOTH keys (full grain) also answers from the summary") {
    try {
      registerSummary()
      def full = fact.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), max("l_shipdate").as("mx"))
        .orderBy("l_returnflag", "l_linestatus")
      val expected = withRule(on = false)(full.collect()).map(_.toString)
      withRule(on = true) {
        assert(!planOf(full).contains("parquet"))
        assert(full.collect().map(_.toString).toSeq == expected.toSeq)
      }
    } finally SummaryRewrite.clear()
  }
}
