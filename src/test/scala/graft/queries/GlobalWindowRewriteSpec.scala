package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Pins the GlobalWindowRewrite optimizer rule: a raw-SQL
  * `row_number() OVER (ORDER BY ...)` must lose its single-partition
  * exchange over the fact table when the rule is enabled, produce
  * IDENTICAL ranks, and stay untouched when disabled or when the window
  * shape is out of scope (rank, partitioned windows). */
class GlobalWindowRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val Enable = org.apache.spark.sql.graftx.GlobalWindowRewrite.EnableConf

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

  private def df = {
    import spark.implicits._
    // unique keys in scrambled order across several partitions
    (1L to 500L).map(i => (i * 7919 % 1000, i)).toDF("k", "id")
      .repartition(4)
  }

  test("rewrite preserves exact global row_number semantics") {
    df.createOrReplaceTempView("gw_t")
    val sql = "SELECT k, id, row_number() OVER (ORDER BY k, id) AS rn FROM gw_t"
    val expected = withRule(on = false)(spark.sql(sql).collect())
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val got = withRule(on = true)(spark.sql(sql).collect())
    assert(got.length == expected.size)
    got.foreach { r =>
      assert(r.getInt(2) == expected((r.getLong(0), r.getLong(1))),
        s"rank mismatch at $r")
    }
  }

  test("rewritten plan range-partitions the fact; no single-partition fact window") {
    df.createOrReplaceTempView("gw_t")
    val sql = "SELECT k, id, row_number() OVER (ORDER BY k, id) AS rn FROM gw_t"
    withRule(on = true) {
      val d = spark.sql(sql)
      d.collect()
      val physical = d.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(physical.contains("rangepartitioning") ||
        physical.contains("RangePartitioning") ||
        physical.contains("REPARTITION_BY_NUM"),
        s"fact must flow through a range exchange:\n$physical")
      // the only SinglePartition exchange left feeds the per-partition
      // counts frame (<= shuffle.partitions rows), identifiable because it
      // sits above the count aggregate, not the fact scan
      val optimized = d.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.optimizedPlan
      val bare = optimized.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      assert(bare.size == 1 && bare.head.toString.contains("__graft"),
        s"exactly the bounded offsets window may stay unpartitioned:\n$optimized")
    }
    withRule(on = false) {
      val optimized = spark.sql(sql)
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.optimizedPlan
      val bare = optimized.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      assert(bare.size == 1 && !bare.head.toString.contains("__graft"),
        "rule off: the naive unpartitioned window must remain")
    }
  }

  test("out-of-scope windows are left alone") {
    df.createOrReplaceTempView("gw_t")
    withRule(on = true) {
      // rank(): tie-aware offsets unsupported -> untouched
      val rk = spark.sql(
        "SELECT k, rank() OVER (ORDER BY k) AS r FROM gw_t")
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.optimizedPlan
      assert(!rk.toString.contains("__graft"), s"rank must not rewrite:\n$rk")
      // partitioned row_number: already scale-safe -> untouched
      val pt = spark.sql(
        "SELECT k, row_number() OVER (PARTITION BY k % 4 ORDER BY id) AS r FROM gw_t")
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.optimizedPlan
      assert(!pt.toString.contains("__graft"),
        s"partitioned windows must not rewrite:\n$pt")
    }
  }

  test("ties co-locate: equal range keys never straddle an offset boundary") {
    import spark.implicits._
    // heavy ties: only 5 distinct keys over 400 rows; ranks must still be
    // a permutation of 1..400 with key-blocks contiguous
    val t = (1L to 400L).map(i => (i % 5, i)).toDF("k", "id").repartition(4)
    t.createOrReplaceTempView("gw_ties")
    withRule(on = true) {
      val rows = spark.sql(
        "SELECT k, row_number() OVER (ORDER BY k) AS rn FROM gw_ties")
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(rows.map(_._2).sorted.toSeq == (1 to 400).toSeq,
        "ranks must be a permutation of 1..n")
      // within the global order, each key's ranks form one contiguous block
      rows.groupBy(_._1).values.foreach { g =>
        val rs = g.map(_._2).sorted
        assert(rs.last - rs.head + 1 == rs.length,
          s"ties split across non-contiguous ranks: $rs")
      }
    }
  }
}
