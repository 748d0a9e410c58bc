package org.apache.spark.sql.graftx

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, HintInfo, Join, JoinHint, LogicalPlan, Project, RepartitionByExpression, Window, BROADCAST}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: plan `row_number() OVER (ORDER BY ...)` — an
  * UNPARTITIONED ranking window — without the single-partition exchange
  * Spark otherwise emits (one reducer sorts the whole table: the classic
  * 100 TB cliff this repo's `globalRanks` exists to avoid, and the shape
  * WindowSweepSpec bans from its own queries).
  *
  * Rewrite: range-repartition the child on the window's sort order (equal
  * keys co-locate, so boundaries respect the total order), rank WITHIN
  * each range partition (`partition by spark_partition_id()`), prefix-sum
  * the per-partition row counts through one bounded offsets window (one
  * row per shuffle partition — never the fact table), broadcast the
  * offsets back, and add. Exactly `globalRanks`, synthesized by the
  * optimizer for raw SQL nobody hand-tuned:
  *
  * {{{
  * Window [row_number() over (order by s)]        -- Exchange SinglePartition
  *   =>
  * Project [out..., (local_rn + coalesce(off, 0)) as rn]
  *   Join broadcast-right (pid = pid_c)
  *     Window [row_number() over (partition by pid order by s)]
  *       Project [out..., spark_partition_id() as pid]
  *         RepartitionByRange s, N                 -- the only wide op
  *     Window [sum(cnt) over (order by pid_c rows unbounded prec..-1)]
  *       Aggregate pid -> count(*)
  *         (same range-repartitioned subtree; physical planning reuses
  *          the exchange — both consumers read ONE shuffle)
  * }}}
  *
  * Correctness hinges on both consumers seeing the SAME partitioning:
  * the repartition is pinned to an explicit partition count
  * (REPARTITION_BY_NUM), which AQE never coalesces, and the two
  * range-exchange subtrees are canonical-identical so ReuseExchange
  * collapses them. Equal sort keys cannot straddle a partition boundary
  * (range partitioner maps equal keys to one bucket), so tie order is
  * exactly as (non-)deterministic as the single-partition plan it
  * replaces.
  *
  * Guarded by `spark.graft.globalWindow.rewrite` (default off, the
  * RangeJoinRewrite opt-in discipline). Fires only on a Window whose
  * partition spec is empty and whose every window expression is a plain
  * `row_number()` — rank/dense_rank need tie-aware offsets and stay on
  * the built-in path.
  */
object GlobalWindowRewrite extends Rule[LogicalPlan] {

  val EnableConf = "spark.graft.globalWindow.rewrite"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled =
      try conf.getConfString(EnableConf, "false").toBoolean
      catch { case _: IllegalArgumentException => false }
    if (!enabled) plan
    else plan.transformUp {
      case w @ Window(Seq(a @ Alias(
            WindowExpression(RowNumber(), spec: WindowSpecDefinition), _)),
          Seq(), orderSpec, child, _)
          if orderSpec.nonEmpty && spec.partitionSpec.isEmpty =>
        rewrite(a, spec, orderSpec, child).getOrElse(w)
    }
  }

  private def rewrite(a: Alias, spec: WindowSpecDefinition,
      orderSpec: Seq[SortOrder], child: LogicalPlan): Option[LogicalPlan] = {
    // pin the partition count: REPARTITION_BY_NUM is exempt from AQE
    // coalescing, so the ranked side and the counts side cannot diverge
    val n = conf.numShufflePartitions
    val repart =
      RepartitionByExpression(orderSpec, child, Some(n), None)
    val pidAlias = Alias(SparkPartitionID(), "__graft_pid")()
    val withPid = Project(child.output :+ pidAlias, repart)
    val pidAttr = pidAlias.toAttribute

    // local ranks within each range partition
    val localSpec = WindowSpecDefinition(Seq(pidAttr), orderSpec,
      spec.frameSpecification)
    val rnLocal = Alias(WindowExpression(RowNumber(), localSpec),
      "__graft_rn")()
    val ranked = Window(Seq(rnLocal), Seq(pidAttr), orderSpec, withPid)

    // per-partition counts -> exclusive prefix sum (one row per shuffle
    // partition: the only unpartitioned window left is over <= n rows).
    // Aggregate output aliases mint fresh exprIds, so the join's two
    // sides keep disjoint outputs even though they share the withPid
    // subtree (which physical planning dedupes via ReuseExchange).
    val pidC = Alias(pidAttr, "__graft_pid_c")()
    val cnt = Alias(Count(Literal(1)).toAggregateExpression(), "__graft_n")()
    val agg = Aggregate(Seq(pidAttr), Seq(pidC, cnt), withPid)
    val pidCAttr = pidC.toAttribute
    val offSpec = WindowSpecDefinition(Seq.empty,
      Seq(SortOrder(pidCAttr, Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-1)))
    val off = Alias(
      WindowExpression(Sum(cnt.toAttribute).toAggregateExpression(), offSpec),
      "__graft_off")()
    val offsets = Window(Seq(off), Seq.empty,
      Seq(SortOrder(pidCAttr, Ascending)), agg)

    val joined = Join(ranked, offsets, Inner,
      Some(EqualTo(pidAttr, pidCAttr)),
      JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))

    // reconstruct the ORIGINAL output attribute (same exprId/name), so
    // every downstream reference keeps resolving
    val rnFinal = Alias(
      Cast(Add(Cast(rnLocal.toAttribute, LongType),
        Coalesce(Seq(off.toAttribute, Literal(0L)))), IntegerType),
      a.name)(exprId = a.exprId, qualifier = a.qualifier)
    Some(Project(child.output :+ rnFinal, joined))
  }
}
