package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, LongType}

/** Native Catalyst expression: `|A ∩ B| >= alpha` for two
  * ascending-sorted `array<bigint>` columns, with EARLY TERMINATION —
  * the merge bails the moment the matches found so far plus the shorter
  * remaining tail can no longer reach `alpha`
  * (`n + min(|A|-i, |B|-j) < alpha` → false without scanning on).
  *
  * This is the threshold-aware half of the set-similarity verify
  * (PPJoin's verification step, Xiao et al. WWW'08 §2.2): a candidate
  * pair whose true overlap is far below the threshold — the vast
  * majority on a dense-vocabulary corpus, where prefix filtering is
  * structurally weak — is rejected after a fraction of the merge
  * instead of a full O(|A|+|B|) pass. Survivors (true near-duplicates)
  * still pay the full merge here plus one [[SortedIntersectCount]] to
  * produce the exact count, but survivors are the linear-sized output,
  * not the quadratic-ish candidate set, so the double scan is noise.
  */
case class SortedIntersectAtLeast(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "sorted_intersect_at_least"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val alpha = c.asInstanceOf[Long]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var n = 0L
    // Exact remaining-possibility bound each step: matches found so far
    // plus the SHORTER remaining tail. min(nx-i, ny-j) must be recomputed
    // from the live cursors — a single decrementing counter would shrink
    // when the LONGER side advances too, under-estimate the bound, and
    // exit prematurely (a false negative, caught by PrefixJoinSpec).
    while (i < nx && j < ny &&
        n + math.min(nx - i, ny - j) >= alpha) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n >= alpha
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val poss = ctx.freshName("poss")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      // Same exact live-cursor bound as the interpreted path: recompute
      // min(nx-i, ny-j) each step — see nullSafeEval's comment.
      s"""
         |int $nx = $a.numElements(), $ny = $b.numElements();
         |int $i = 0, $j = 0; long $n = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $poss = ($nx - $i) < ($ny - $j) ? ($nx - $i) : ($ny - $j);
         |  if ($n + $poss < $c) break;
         |  long $xv = $a.getLong($i), $yv = $b.getLong($j);
         |  if ($xv == $yv) { $n++; $i++; $j++; }
         |  else if ($xv < $yv) $i++;
         |  else $j++;
         |}
         |${ev.value} = $n >= $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SortedIntersectAtLeast =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SortedIntersectAtLeastFn {
  def sortedIntersectAtLeast(a: Column, b: Column, alpha: Column): Column =
    ExpressionUtils.column(SortedIntersectAtLeast(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      ExpressionUtils.expression(alpha)))
}
