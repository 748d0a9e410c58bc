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

  /** One AQE-off CHILD session per caller session, lazily built and
    * reused (SessionState construction is ~100s of ms — too much per
    * invocation). The parent's runtime confs are re-copied on every
    * acquisition, so determinism-relevant confs can't drift; the only
    * divergence is AQE off. All `conf.set` here targets the PRIVATE child
    * session — the caller's conf is never touched, which is the whole
    * point (a set/restore on the shared session races with concurrent
    * queries; ConcurrencySpec's lint pins that pattern out). */
  private val quietSessions =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      org.apache.spark.sql.SparkSession]()

  private def quietSession(
      parent: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    synchronized {
      var s2 = quietSessions.get(parent)
      if (s2 == null) { s2 = parent.newSession(); quietSessions.put(parent, s2) }
      parent.conf.getAll.foreach { case (k, v) =>
        if (s2.conf.isModifiable(k) && !s2.conf.getOption(k).contains(v))
          s2.conf.set(k, v)
      }
      s2.conf.set("spark.sql.adaptive.enabled", "false")
      s2
    }

  /** Ranks after `iters` power iterations over a directed edge list
    * (`src`, `dst` long columns). Returns (id, rank). Damping `d`,
    * uniform teleport. All nodes appearing as src or dst participate.
    *
    * `assumeNoDangling = true` is the fast path for graphs where every
    * node has an out-edge (e.g. symmetrized similarity graphs): rounds
    * carry no dangling-mass aggregate, so the whole iteration is ONE
    * linear declarative plan executed by a single job — no per-round
    * materialization. The general path folds dangling mass into the
    * teleport term and pays one eager checkpoint per round (the
    * dangling aggregate makes `ranks` feed two consumers; without
    * truncation recomputation doubles per round). */
  def run(edges: DataFrame, iters: Int, d: Double = 0.85,
      assumeNoDangling: Boolean = false): DataFrame = {
    val caller = edges.sparkSession
    val par = caller.sparkContext.defaultParallelism
    val eWide = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(par, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Right-size the iteration layout to the GRAPH, not the cluster: each
    // round is a fixed number of shuffle stages over these frames, so a
    // tiny graph on many cores would pay cores×rounds in task scheduling
    // for microsecond tasks (measured 3× on the 250-node q100 graph).
    // ~100k edges per partition; large graphs keep full parallelism.
    val eCnt = eWide.count()
    val iterPar = math.max(1L, math.min(par.toLong, eCnt / 100000L + 1)).toInt
    val e =
      if (iterPar < par) {
        val r = eWide.repartition(iterPar, col("src"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        r.count()
        eWide.unpersist(blocking = false)
        r
      } else eWide
    // In the tiny-graph regime (everything fits one partition) AQE only
    // adds per-stage re-planning latency — measured 2.3 s → 1.5 s for the
    // 4-round q100 iteration with it off. Large graphs (iterPar > 1) keep
    // AQE for runtime coalesce/skew handling. The suspension runs in an
    // ISOLATED CHILD SESSION (parent confs copied, AQE off) instead of
    // toggling the caller's conf: a set/restore on a shared session races
    // with concurrent queries — one invocation's `finally` could re-enable
    // AQE under another's in-flight loop (ConcurrencySpec lints the
    // set-then-restore pattern out of main source for exactly this).
    val quiet = iterPar == 1 &&
      caller.conf.get("spark.sql.adaptive.enabled", "true") == "true"
    // Frames must BELONG to the executing session for its confs to apply;
    // re-bind a CHECKPOINTED edge frame (LogicalRDD — data, no lineage, so
    // nothing can recompute outside the cache) through a shared global
    // temp view (unique name, dropped once analyzed) — the public API for
    // moving a plan across sessions.
    val eLocal = if (!quiet) e else {
      val s2 = PageRank.quietSession(caller)
      val eChk = e.localCheckpoint(true)
      val v = "graft_pr_" + java.util.UUID.randomUUID.toString.replace("-", "")
      eChk.createGlobalTempView(v)
      val f = s2.table(s"global_temp.$v")
      f.schema // forces analysis: the view body is inlined into the plan
      s2.catalog.dropGlobalTempView(v)
      f
    }
    // (id, deg) for every node; deg null => dangling. On the no-dangling
    // path every node has an out-edge, so the src-side degree count IS the
    // node set — one shuffle instead of union+distinct+left-join (three).
    val nodeDeg = (
      if (assumeNoDangling)
        eLocal.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      else
        eLocal.select(col("src").as("id"))
          .union(eLocal.select(col("dst").as("id"))).distinct()
          .join(eLocal.groupBy(col("src").as("id"))
              .agg(count(lit(1)).as("deg")),
            Seq("id"), "left")
      ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = nodeDeg.count()
      var ranks = nodeDeg.select(col("id"), lit(1.0 / n).as("rank"))
      var it = 0
      while (it < iters) {
        // mass flowing through edges this round — `ranks`' only consumer
        // on the fast path, so that lineage stays linear
        val contrib = ranks.join(nodeDeg, Seq("id"))
          .join(eLocal, col("id") === col("src"))
          .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
          .groupBy("id").agg(sum("c").as("in_mass"))
        if (assumeNoDangling) {
          ranks = nodeDeg.select(col("id"))
            .join(contrib, Seq("id"), "left")
            .select(col("id"),
              (lit((1.0 - d) / n) +
                lit(d) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
        } else {
          // dangling mass via the Σrank = 1 invariant (= 1 − Σ in_mass):
          // no second read of `ranks`, and the 1-row aggregate broadcasts
          val flowed = contrib
            .agg(coalesce(sum("in_mass"), lit(0.0)).as("fm"))
          ranks = nodeDeg.select(col("id"))
            .join(contrib, Seq("id"), "left")
            .crossJoin(broadcast(flowed))
            .select(col("id"),
              (lit((1.0 - d) / n) + lit(d) * (lit(1.0) - col("fm")) / n +
                lit(d) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
        }
        it += 1
        // One eager checkpoint per round — same shape as
        // connectedComponents. Measured alternatives are all worse: on the
        // general path contrib feeds two consumers, so un-truncated
        // lineage doubles recomputation per round (2^rounds — 46 s for 4
        // rounds on the q100 graph); and even with linear lineage, one
        // deep multi-round job is slower than round-sized jobs (AQE
        // schedules its ~3 exchanges per round sequentially with ~0.5 s
        // of stage overhead regardless, and re-plans the deep tail each
        // stage). Round-sized jobs: ~0.4 s/round at any local scale.
        // the last round materializes too when AQE was suspended: the
        // caller's action must not lazily re-run round `iters` outside
        // the quiet child session / after the e/nodeDeg caches drop
        if (it < iters || quiet) ranks = ranks.localCheckpoint(true)
      }
      if (!quiet) ranks
      else {
        // hand the (checkpointed → LogicalRDD, dependency-free) result
        // back on the CALLER's session so downstream plans keep its confs
        val v = "graft_pr_out_" +
          java.util.UUID.randomUUID.toString.replace("-", "")
        ranks.createGlobalTempView(v)
        val out = caller.table(s"global_temp.$v")
        out.schema
        caller.catalog.dropGlobalTempView(v)
        out
      }
    } finally {
      e.unpersist(blocking = false)
      nodeDeg.unpersist(blocking = false)
    }
  }
}
