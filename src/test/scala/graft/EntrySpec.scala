package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry() on sf0.001 must return rows, and the
  * registry must expose a (queries, oracleSql) pair per oracle-checked op. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("entry() returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry is consistent: unique names, every oracle key has a query") {
    val qs = SparkEntry.queries
    val oracles = SparkEntry.oracleSql
    assert(qs.nonEmpty)
    assert(oracles.keySet.subsetOf(qs.keySet),
      s"orphan oracles: ${oracles.keySet -- qs.keySet}")
    // column-name discipline: every oracle has explicit AS aliases for
    // computed columns is enforced by the DuckDB compare in scripts/check.sh
  }

  test("every query runs at smoke scale and returns a non-empty result") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          if (fn(spark, "/root/testdata/sf0.001").limit(1).count() == 0)
            Some(s"$name: empty") else None
        } catch { case e: Throwable =>
          Some(s"$name: ${String.valueOf(e.getMessage).take(80)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
