package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame-native PageRank (power iteration) — the third iterative
  * primitive next to [[graft.dedup.Dedup.connectedComponents]] and
  * [[KMeans]]. In a training-data pipeline this is the host/domain
  * authority signal (crawl prioritization, per-domain quality weighting):
  * rank flows along the link graph, so link-farm spam with few inbound
  * edges scores low however much it interlinks itself.
  *
  * Shape at 100 TB: per iteration one equi-join of ranks onto the edge
  * list (shuffle on the edge's src key) and one aggregation by dst with
  * map-side partial sums — identical to every production PageRank on a
  * relational engine. Edges and out-degrees are computed once and
  * persisted; per-round lineage is truncated the same way
  * connectedComponents does (localCheckpoint via the persisted input, the
  * ranks frame itself stays k rows per node — no driver-side graph).
  *
  * Dangling nodes (no outbound edges) redistribute uniformly: their mass
  * is folded into the teleport term each round, keeping Σrank = 1 exactly
  * (up to float summation, which — as in any distributed PageRank — is
  * partition-order dependent; callers round before comparing).
  */
object PageRank {

  /** Ranks after `iters` power iterations over a directed edge list
    * (`src`, `dst` long columns). Returns (id, rank). Damping `d`,
    * uniform teleport. All nodes appearing as src or dst participate. */
  def run(edges: DataFrame, iters: Int, d: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(par, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // (id, deg) for every node; deg null => dangling
    val nodeDeg = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .join(e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")),
        Seq("id"), "left")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = nodeDeg.count()
      var ranks = nodeDeg.select(col("id"), lit(1.0 / n).as("rank"))
      var it = 0
      while (it < iters) {
        val withDeg = ranks.join(nodeDeg, Seq("id"))
        // mass leaving through edges; dangling mass teleports uniformly —
        // a one-scalar driver reduction per round (like k-means' centroid
        // collect, this IS the round's reduction result, not corpus data)
        val dangling = withDeg.filter(col("deg").isNull)
          .agg(coalesce(sum("rank"), lit(0.0))).first().getDouble(0)
        val contrib = withDeg.filter(col("deg").isNotNull)
          .join(e, col("id") === col("src"))
          .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
          .groupBy("id").agg(sum("c").as("in_mass"))
        val base = (1.0 - d) / n + d * dangling / n
        ranks = nodeDeg.select(col("id"))
          .join(contrib, Seq("id"), "left")
          .select(col("id"),
            (lit(base) + lit(d) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
          .localCheckpoint(true) // truncate per-round lineage
        it += 1
      }
      ranks
    } finally {
      e.unpersist(blocking = false)
      nodeDeg.unpersist(blocking = false)
    }
  }
}
