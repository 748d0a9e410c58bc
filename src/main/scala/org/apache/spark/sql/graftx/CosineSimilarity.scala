/** graft's spark-internal-access package: native Catalyst expressions need
  * `private[sql]` API (AbstractDataType, ExpressionUtils), so they live in an
  * `org.apache.spark.sql` subpackage — the established pattern for Spark
  * extension libraries. Everything else in graft stays on the public API. */
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity over two `array<float>`
  * columns, computed in double with a single fused primitive loop.
  *
  * This is the 100 TB fast path for similarity search (SURVEY.md §7.4): the
  * higher-order-function form (graft.functions.VectorOps.cosine) allocates
  * per-element lambda frames and makes three array traversals; this
  * expression makes one pass with no allocation, and `doGenCode` splices the
  * loop directly into whole-stage codegen. Both forms accumulate
  * left-to-right in double, so results are bit-identical (pinned by
  * VectorFunctionsSpec).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  // Degenerate inputs yield NULL, not a silent wrong answer: mismatched
  // dimensions would otherwise score a truncated prefix, and a zero-norm
  // vector would yield NaN — which Spark orders ABOVE every double, so a
  // single garbage embedding would rank #1 in every `ORDER BY cos DESC`
  // top-k. NULL drops out of thresholds and rankings instead. A NULL
  // element likewise nulls the result (ArrayData.getFloat on a null slot
  // reads garbage-or-zero) — the same propagation the zip_with/aggregate
  // baseline in VectorOps.cosine has, keeping the two forms bit-identical
  // on every input.
  //
  // Perf: the null-element check is hoisted OUT of the arithmetic loop —
  // in CODEGEN it is skipped entirely when both child schemas say
  // containsNull=false, and otherwise runs as a separate tight pre-scan
  // (bit tests only, no float math) so the fused multiply-accumulate loop
  // carries zero branches. The per-element branch inside the hot loop cost
  // ~60% on the q44 all-pairs kernel (BENCH_r01 1.21 s → r02 1.92 s).
  //
  // The codegen skip TRUSTS the child schema: an upstream expression that
  // mis-declares containsNull=false while producing null slots would make
  // the kernel read a garbage/zero float instead of returning NULL. That is
  // the standard Catalyst contract (every built-in collection expression
  // relies on declared element nullability), so the skip is sound for any
  // well-formed plan; the interpreted path below nevertheless ALWAYS
  // pre-scans — it is not the hot path, and keeping the scan there means
  // non-codegen execution preserves the NULL contract even against a
  // mis-declaring child.
  private lazy val mayHaveNullElements: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var j = 0
    while (j < n) {
      if (x.isNullAt(j) || y.isNullAt(j)) return null
      j += 1
    }
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val nullScan = if (mayHaveNullElements) {
        s"""
           |for (int $j = 0; $j < $n; $j++) {
           |  if ($a.isNullAt($j) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
           |}
         """.stripMargin
      } else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullScan
         |}
         |if (!${ev.isNull}) {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Column↔Expression bridge for graft code outside the sql package. */
object GraftExpressions {
  def cosineSimilarity(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
