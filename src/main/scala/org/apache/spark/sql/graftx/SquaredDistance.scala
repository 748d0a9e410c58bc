package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: squared Euclidean distance ‖a−b‖² over two
  * `array<float>` columns, computed in double with a single fused loop.
  *
  * The L2 counterpart of [[CosineSimilarity]] — the kernel behind product
  * quantization (codebook fitting, encoding, and ADC table construction all
  * reduce to sub-vector L2 argmins). Encoding a 100 TB corpus evaluates it
  * m×k times per vector, so it gets the same treatment as the cosine
  * kernel: one pass, no allocation, spliced into whole-stage codegen.
  *
  * NULL contract mirrors CosineSimilarity: mismatched dimensions or a NULL
  * element yield NULL (never a truncated-prefix or garbage distance). The
  * null pre-scan is skipped in codegen when both child schemas declare
  * containsNull=false — trusting declared element nullability, the standard
  * Catalyst contract — while the interpreted path always scans.
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "squared_distance"

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
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val dd = ctx.freshName("dd")
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
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $dd = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |    $acc += $dd * $dd;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

object SquaredDistanceFn {
  def squaredDistance(a: Column, b: Column): Column =
    ExpressionUtils.column(SquaredDistance(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
