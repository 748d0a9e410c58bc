package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical
import graft.{SparkEntry, SparkTestSession}

/** Lint-sweep over EVERY registered query's optimized logical plan: no
  * `Window` with an empty partition spec may appear except over the
  * explicitly allowlisted bounded frames. An unpartitioned window is
  * Exchange SinglePartition at execution — one reducer sees the whole
  * input, the classic 100 TB cliff (the shape q108/q110 carried until
  * round 6). This spec makes the ban structural: a future query that
  * sneaks in a global ntile/row_number over a fact table fails here even
  * if its values are correct, and an allowlisted query that LOSES its
  * unpartitioned window (e.g. a refactor away from the prefix-sum
  * pattern) fails too, forcing the allowlist to stay truthful.
  */
class WindowSweepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** Queries whose unpartitioned window runs over a provably bounded frame
    * (never the corpus): each entry documents the frame and its bound. */
  val allow: Map[String, String] = Map(
    "q108_zorder_layout" ->
      "offsets prefix-sum: one row per zval>>16 bucket, <=2^16 by construction",
    "q110_binning" ->
      "offsets prefix-sum: one row per o_totalprice/1000 bucket (~600, domain-bounded)",
    "q113_global_ids" ->
      "offsets prefix-sum: one row per l_orderkey/1000 bucket (key-range bounded)",
    "q155_shuffle_shard" ->
      "offsets prefix-sum: one row per leading-hex-pair bucket, <=256 by construction",
    // NOTE q122's token-order offsets window (bounded by the <=36^3 3-gram
    // universe) runs inside an eager localCheckpoint during plan
    // CONSTRUCTION, so it never appears in the final optimized plan this
    // sweep inspects — same blind spot for any checkpoint-internal window.
    // The sweep still covers every lazily-planned window in the registry.
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
    "q274_path_trigrams" ->
      "rank stamp over the post-aggregate path frame: <= |types|^3 = 125 rows by construction",
    "q275_heaps_law" ->
      "offsets prefix-sum: one row per doc_id/500 bucket (key-range bounded, the q113 pattern)",
    "q297_bh_fdr" ->
      "BH rank + suffix-min: one row per event_type (<=|types|, domain-bounded)",
    "q330_personalized_pagerank" ->
      "seed pick + final top-20 rank over the near-dup GRAPH NODE frame (graph-sized, corpus-sublinear; the 8 matvec rounds are joins, not windows)")
  // NOTE q302's globalRanks offsets window (bounded by the n_chars/100
  // bucket domain, the q110 pattern) runs UPSTREAM of the eager
  // localCheckpoint on its count frame, so it never appears in the final
  // optimized plan this sweep inspects — same blind spot as q122/q175.
  // NOTE q175's rank stamp (unpartitioned, but over a post-limit <=20-row
  // frame) runs inside its eager localCheckpoint during plan construction
  // — the same sweep blind spot as q122's token-order offsets window.

  test("no query plans an unpartitioned window or a cartesian product outside the allowlists") {
    val windowHits = Set.newBuilder[String]
    val cartesianHits = Set.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val qe = fn(spark, sf)
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution
      val badWindows = qe.optimizedPlan.collect {
        case w: logical.Window if w.partitionSpec.isEmpty => w
      }
      if (badWindows.nonEmpty) windowHits += name
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
        "either partition the window (globalRanks pattern) or allowlist it " +
        "with the bound that makes the frame safe")
    assert(vanished.isEmpty,
      s"allowlisted queries no longer carry an unpartitioned window: $vanished — " +
        "prune the allowlist so it stays truthful")
    assert(cartesianHits.result().isEmpty,
      s"CartesianProduct planned in: ${cartesianHits.result()} — broadcast " +
        "the bounded side or restructure to an equi-join")
  }
}
