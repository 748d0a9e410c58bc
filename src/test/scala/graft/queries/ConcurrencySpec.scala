package graft.queries

import java.security.MessageDigest
import java.util.concurrent.Executors

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkTestSession}

/** Pins shared-session concurrency (round-9 verdict #2): a multi-tenant
  * cluster runs many registered queries on ONE SparkSession at once, so
  * every query must produce the sequential-run result under concurrent
  * planning and execution. The round-9 connected-components rewrite
  * (Dedup.scala) and the round-10 PageRank child-session AQE suspension
  * were both motivated by exactly this hazard; nothing pinned it until
  * now.
  *
  * Two layers:
  *  1. Behavior: a mixed heavy/light panel — iterative (q78 CC, q100
  *     PageRank, q128 GD), conf-opt-in rewrites (q99 range join), sketch
  *     (q242), catalog DDL/DML (q276 MERGE), plus joins/windows — runs
  *     sequentially, then 12-way concurrently on the shared session;
  *     per-query result hashes must match exactly.
  *  2. Lint: no main-source file may mutate the session conf at runtime
  *     outside the truthful allowlist below — a set/restore on a shared
  *     session races with concurrent queries even when each site is
  *     individually correct.
  */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = graft.Graft.ensureConfigured(SparkTestSession.spark)
  private val sfDir = "/root/testdata/sf0.001"

  /** Mixed panel: iterative, conf-toggling, DDL-running, sketching, and
    * plain relational queries — the shapes most likely to interfere. */
  private val panel = Seq(
    "q01_scan_prune", "q04_join_broadcast", "q14_window_rank",
    "q41_minhash_lsh", "q78_dedup_clusters", "q93_semantic_dedup",
    "q99_auto_range_join", "q100_graph_rank", "q128_quality_classifier",
    "q156_fuzzy_dedup_pipeline", "q242_kll_quantiles", "q276_merge_into")

  private def hashOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    // hash the rows as a multiset: every query orders deterministically,
    // but hashing sorted row-strings keeps the assertion independent of
    // collect order so a failure always means VALUES diverged
    val rows = df.collect().map(_.toString).sorted
    val md = MessageDigest.getInstance("MD5")
    rows.foreach(r => md.update(r.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  test("12 concurrent queries on one shared session match sequential hashes") {
    val sequential = panel.map(n => n -> hashOf(n)).toMap
    val pool = Executors.newFixedThreadPool(panel.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val concurrent = Await.result(
        Future.sequence(panel.map(n => Future(n -> hashOf(n)))),
        15.minutes).toMap
      panel.foreach { n =>
        assert(concurrent(n) === sequential(n),
          s"$n diverged under concurrency")
      }
    } finally pool.shutdown()
  }

  /** Runtime session-conf mutation allowlist — every entry is either
    * setup-time, a private child session, or a documented plan-build
    * opt-in whose conf only changes PLAN SHAPE (never values) and is
    * re-pinned to its default by every Tables.load:
    *  - Graft.scala: configure/ensureConfigured — the conf pinning itself
    *  - ml/PageRank.scala: sets conf on its PRIVATE cached child session
    *    only (quietSession); the caller session is never touched
    *  - queries/CurationQueries.scala (q99), queries/ScaleQueries.scala
    *    (q173), queries/MaintenanceQueries.scala (q202),
    *    queries/FormatQueries.scala (q216): per-query opt-in rewrite /
    *    reader flags set just before plan BUILD; a concurrent reset only
    *    loses the rewrite, never changes results (plan-shape-only confs)
    *  - tools/: standalone probes, never on a query path
    */
  private val confSetAllowlist = Set(
    "Graft.scala", "PageRank.scala", "CurationQueries.scala",
    "ScaleQueries.scala", "MaintenanceQueries.scala", "FormatQueries.scala")

  test("lint: no main-source session-conf mutation outside the allowlist") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(_.toString.contains("/tools/"))
      .flatMap { p =>
        val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        val hits = "\\.conf\\.set\\(|setConf\\(".r
          .findAllMatchIn(text).size
        if (hits > 0) Some(p.getFileName.toString -> hits) else None
      }.toMap
    val unexpected = offenders.keySet.diff(confSetAllowlist)
    assert(unexpected.isEmpty,
      s"new runtime conf.set sites need review + allowlisting: $unexpected")
    // the allowlist itself must stay truthful: files that stop mutating
    // conf must leave it, so it can't hide future regressions
    val stale = confSetAllowlist.diff(offenders.keySet)
    assert(stale.isEmpty, s"allowlist entries no longer needed: $stale")
  }
}
