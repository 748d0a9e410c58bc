package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import graft.{SparkEntry, SparkTestSession}

/** Lint-sweep over EVERY registered query's optimized logical plan — AND,
  * since round 12, every plan executed eagerly DURING its construction
  * (localCheckpoint/collect fixtures) — no `Window` with an empty
  * partition spec may appear except over provably bounded frames. An
  * unpartitioned window is Exchange SinglePartition at execution — one
  * reducer sees the whole input, the classic 100 TB cliff (the shape
  * q108/q110 carried until round 6). This spec makes the ban structural: a
  * future query that sneaks in a global ntile/row_number over a fact table
  * fails here even if its values are correct, and an allowlisted query
  * that LOSES its unpartitioned window (e.g. a refactor away from the
  * prefix-sum pattern) fails too, forcing the allowlist to stay truthful.
  *
  * Two structural exemptions need no allowlist entry because the bound is
  * visible in the plan itself:
  *   - a window whose child chain bottoms out in a Limit
  *     (LimitPushDownThroughWindow: the single partition sees at most k
  *     rows via the distributed TakeOrderedAndProject below — q330's
  *     final rank, PlanSpec-pinned);
  *   - a window directly over a WindowGroupLimit (rank-limit pushdown:
  *     each partition pre-filters to its local top-k before the final).
  *
  * The checkpoint-boundary sweep (round-11 verdict #6) closes the blind
  * spot the round-6..11 NOTEs documented: a window upstream of an EAGER
  * localCheckpoint executes during plan construction and never appears in
  * the final optimized plan. A QueryExecutionListener captures every
  * execution's optimized plan while the query builder runs; those plans
  * are linted with the same rule against their own allowlist.
  */
class WindowSweepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** Queries whose FINAL plan carries an unpartitioned window over a
    * provably bounded frame (never the corpus): each entry documents the
    * frame and its bound. */
  val allow: Map[String, String] = Map(
    "q108_zorder_layout" ->
      "offsets prefix-sum: one row per zval>>16 bucket, <=2^16 by construction",
    "q110_binning" ->
      "offsets prefix-sum: one row per o_totalprice/1000 bucket (~600, domain-bounded)",
    "q113_global_ids" ->
      "offsets prefix-sum: one row per l_orderkey/1000 bucket (key-range bounded)",
    "q155_shuffle_shard" ->
      "offsets prefix-sum: one row per leading-hex-pair bucket, <=256 by construction",
    "q136_eval_metrics" ->
      "AUC rank walk: one row per DISTINCT score (Zipf-small, round-5 rewrite)",
    "q173_auto_global_rank" ->
      "GlobalWindowRewrite offsets prefix-sum: one row per range partition, <= spark.sql.shuffle.partitions by construction",
    "q200_skyline" ->
      "bucket-min prefix: one row per price/1000 bucket (~110, domain-bounded)",
    "q221_gini" ->
      "offsets prefix-sum: one row per o_totalprice/1000 bucket (~110, domain-bounded)",
    "q222_mann_whitney" ->
      "offsets prefix-sum: one row per value/10 bucket (<=48, domain-bounded)",
    "q275_heaps_law" ->
      "offsets prefix-sum: one row per doc_id/500 bucket (key-range bounded, the q113 pattern)",
    "q297_bh_fdr" ->
      "BH rank + suffix-min: one row per event_type (<=|types|, domain-bounded)")
  // q330's final top-20 rank no longer needs an entry: its limit pushes
  // below the window (PlanSpec-pinned), so the structural Limit exemption
  // covers it — round-11 verdict #5.

  /** Queries with an unpartitioned window inside an eagerly-CHECKPOINTED
    * subplan (invisible to the final-plan sweep): same contract — document
    * the frame and its bound. These are the round-6..11 NOTE entries, now
    * enforced instead of prose. */
  val allowCheckpointed: Map[String, String] = Map(
    "q122_prefix_setjoin" ->
      "vocab rarity-rank offsets prefix-sum: one row per floor(log2(df)) bucket over the <=36^3 3-gram universe",
    // q175's rank stamp sits over a post-limit <=20-row frame — the
    // structural Limit exemption covers it, no entry needed
    "q302_coverage_curve" ->
      "globalRanks offsets prefix-sum: one row per n_chars/100 bucket (domain-bounded, the q110 pattern)",
    // the next three were INVISIBLE to every sweep before round 12 — the
    // checkpoint-boundary capture surfaced them; all three frames are
    // bounded by construction, not corpus-sized
    "q184_bpe_roundtrip" ->
      "dense-id intern rank over the DISTINCT BPE-token vocab (Zipf-bounded type set, never the occurrence corpus)",
    "q317_lead_lag" ->
      "date-grid rank (dk): one row per day in the corpus time span — grows with calendar time, not data volume",
    "q329_neyman_alloc" ->
      "largest-remainder rank over the event-type strata frame: <= |types| rows, domain-bounded")

  /** Bounded-input exemption: the single partition the empty-spec window
    * runs on receives at most k rows, because a Limit (planned as the
    * distributed TakeOrderedAndProject / CollectLimit) or a
    * WindowGroupLimit partial sits below it. */
  private def boundedBelow(p: LogicalPlan): Boolean = p match {
    case _: logical.GlobalLimit | _: logical.LocalLimit => true
    case _: logical.WindowGroupLimit => true
    case s: logical.Sort => boundedBelow(s.child)
    case pr: logical.Project => boundedBelow(pr.child)
    case _ => false
  }

  private def badWindows(plan: LogicalPlan): Seq[logical.Window] =
    plan.collect {
      case w: logical.Window
          if w.partitionSpec.isEmpty && !boundedBelow(w.child) => w
    }

  test("no query plans an unpartitioned window or a cartesian product outside the allowlists") {
    // Checkpoint-boundary capture: every eager execution during a query
    // builder (localCheckpoint fixtures, bounded model-state collects)
    // lands here with its optimized plan, attributed to the query under
    // construction.
    val captured = scala.collection.mutable.ArrayBuffer.empty[LogicalPlan]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        captured.synchronized { captured += qe.optimizedPlan; () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val windowHits = Set.newBuilder[String]
      val checkpointHits = Set.newBuilder[String]
      val cartesianHits = Set.newBuilder[String]
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        captured.synchronized(captured.clear())
        val qe = fn(spark, sf)
          .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution
        org.apache.spark.sql.graftx.ListenerBusFlush.flush(spark)
        val inner = captured.synchronized(captured.toList)
        if (badWindows(qe.optimizedPlan).nonEmpty) windowHits += name
        if (inner.exists(p => badWindows(p).nonEmpty)) checkpointHits += name
        // CartesianProduct = a cross join where NEITHER side broadcasts —
        // both sides replicate partition-by-partition, the join-shaped twin
        // of the single-partition window cliff. Every legitimate cross in
        // this repo rides a broadcast (1-row aggregates, k-centroid dims,
        // query panels), so the allowlist is empty: any appearance is a bug.
        if (qe.executedPlan.toString.contains("CartesianProduct"))
          cartesianHits += name
      }
      val hits = windowHits.result()
      val unexpected = hits -- allow.keySet
      val vanished = allow.keySet -- hits
      assert(unexpected.isEmpty,
        s"unpartitioned window over a non-allowlisted frame in: $unexpected — " +
          "either partition the window (globalRanks pattern), bound it with " +
          "a pushed limit, or allowlist it with the bound that makes it safe")
      assert(vanished.isEmpty,
        s"allowlisted queries no longer carry an unpartitioned window: $vanished — " +
          "prune the allowlist so it stays truthful")
      val ckptHits = checkpointHits.result()
      val ckptUnexpected = ckptHits -- allowCheckpointed.keySet
      val ckptVanished = allowCheckpointed.keySet -- ckptHits
      assert(ckptUnexpected.isEmpty,
        s"unpartitioned window inside a checkpointed subplan in: $ckptUnexpected — " +
          "the final-plan sweep cannot see it; bound it or allowlist it " +
          "in allowCheckpointed with its frame bound")
      assert(ckptVanished.isEmpty,
        s"allowCheckpointed queries no longer execute an unpartitioned window " +
          s"during construction: $ckptVanished — prune the allowlist")
      assert(cartesianHits.result().isEmpty,
        s"CartesianProduct planned in: ${cartesianHits.result()} — broadcast " +
          "the bounded side or restructure to an equi-join")
    } finally spark.listenerManager.unregister(listener)
  }
}
