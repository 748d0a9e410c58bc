package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkTestSession}

/** Pins the physical-plan properties the 100 TB posture depends on: filters
  * reach the parquet scan, column pruning holds, small dims broadcast, and
  * the similarity kernels stay inside whole-stage codegen. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** Pre-execution formatted plan (scan details: PushedFilters/ReadSchema). */
  def planOf(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  /** Post-execution final AQE plan (codegen spans only exist here). */
  def executedPlanOf(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
  }

  test("q01 scan gets pushed filters and a pruned read schema") {
    val p = planOf("q01_scan_prune")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") && p.contains("LessThan(l_shipdate"),
      s"shipdate range must reach the scan:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_shipdate:timestamp"),
      s"scan must read exactly the 4 projected columns:\n$p")
  }

  test("q04 star join broadcasts both dimensions, no fact shuffle before agg") {
    val p = planOf("q04_join_broadcast")
    // both dims broadcast -> two BroadcastHashJoin nodes (formatted explain
    // lists each node in the tree and again in the details section)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"),
      s"dims must broadcast, not sort-merge:\n$p")
  }

  test("q02 narrow projection stays in one whole-stage codegen span") {
    // codegen'd operators render as "*(n) Op" in the executed plan
    val p = executedPlanOf("q02_project_filter")
    assert(p.contains("*(1) Project") || p.contains("WholeStageCodegen"), p)
  }

  test("q50 knn filter/projection uses the native cosine inside codegen") {
    val p = planOf("q50_knn_brute")
    assert(p.contains("cosine_similarity"), s"native expression expected:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$p")
  }
}
