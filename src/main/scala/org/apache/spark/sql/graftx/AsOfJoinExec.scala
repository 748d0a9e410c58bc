package org.apache.spark.sql.graftx

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator extension tier (c) of the custom-operator ladder
  * (SURVEY.md §7.3): a first-class AS-OF JOIN — logical node, planner
  * strategy, and a sort-merge physical operator — registered through
  * SparkSessionExtensions/experimental strategies.
  *
  * Semantics: for each left row, the LATEST right row with the same key and
  * `rightTime <= leftTime` (ties on time broken by the largest
  * `rightTiebreak`) — left-outer: unmatched left rows surface null right
  * columns. Identical to [[graft.queries.AsOfJoin.joinPrior]]'s composed
  * union+window form (the (a)-tier baseline this operator is pinned
  * against).
  *
  * Why a physical operator when the composition exists: the union+window
  * form materializes BOTH sides through one window sort and carries a
  * payload struct through every row; the merge join streams each partition
  * once with O(1) state — no payload widening, no carried struct, and the
  * child sorts are exactly the (key, time) sorts a time-series table often
  * already has (in which case EnsureRequirements elides them and the join
  * is zero-sort). 100 TB shape: both sides hash-cluster on the key (the
  * SAME distribution contract SortMergeJoin uses, so AQE/EnsureRequirements
  * co-partition or reuse exchanges), and each task holds one right-side
  * candidate row, never a buffered group.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Expression) extends BinaryNode {

  // fail at construction, not as a ClassCastException inside executor
  // tasks: the merge compares left-evaluated and right-evaluated values
  // under ONE ordering, which is only sound for identical types
  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Same contract as SortMergeJoin: cluster both sides on the key …
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // … and sort within partitions by (key, time[, tiebreak]) so one forward
  // merge pass suffices.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTiebreak, Ascending)))

  // Left-outer shape: every left row appears exactly once, in left order.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      // one-candidate state: the best right row seen so far and its key
      var cand: InternalRow = null
      var candKey: Any = null

      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTimeB.eval(lRow)
        if (lk != null && lt != null) {
          // advance the right side: consume rows with smaller keys (they
          // can never match a later left row — left is key-ascending) and
          // same-key rows at or before lt (each overwrites the candidate;
          // right is (time, tiebreak)-ascending, so the last one kept is
          // the latest-then-largest-tiebreak)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val h = rBuf.head
            val hk = rKeyB.eval(h)
            if (hk == null) { rBuf.next() }
            else {
              val c = keyOrd.compare(hk, lk)
              if (c < 0) rBuf.next()
              else if (c > 0) advancing = false
              else {
                val ht = rTimeB.eval(h)
                if (ht == null) { rBuf.next() }
                else if (timeOrd.compare(ht, lt) <= 0) {
                  cand = rBuf.next().copy()
                  candKey = rKeyB.eval(cand)
                } else advancing = false
              }
            }
          }
        }
        // lt != null is load-bearing, not just defensive: a null-time left
        // row must never match (no "prior" exists for an undefined time).
        // Without it the check would silently depend on NullsFirst sort
        // placement putting null-time rows before any same-key candidate.
        val matched = cand != null && lk != null && lt != null &&
          candKey != null && keyOrd.compare(candKey, lk) == 0
        project(joined(lRow, if (matched) cand else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point (the graftx bridge — Dataset.ofRows is
  * sql-private). Column names must not collide across sides; rename before
  * calling. */
object AsOfJoinDsl {
  def joinPrior(leftDf: DataFrame, rightDf: DataFrame, leftKey: String,
      rightKey: String, leftTs: String, rightTs: String,
      rightTiebreak: String): DataFrame = {
    val spark = leftDf.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    Dataset.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTs), attr(rPlan, rightTs), attr(rPlan, rightTiebreak)))
  }
}
