package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: inner product ⟨a,b⟩ over two `array<float>`
  * columns, accumulated in double with a single fused loop.
  *
  * The third kernel in the vector family ([[CosineSimilarity]] for
  * normalized similarity, [[SquaredDistance]] for L2): maximum-inner-
  * product search (MIPS) ranks by the RAW dot product — the scoring rule
  * when corpus vectors carry meaningful norms (popularity/recency-scaled
  * document embeddings, two-tower retrieval logits), where cosine's
  * normalization would erase the signal. Evaluated corpus×queries times
  * per retrieval pass, so it gets the same treatment: one pass, no
  * allocation, spliced into whole-stage codegen.
  *
  * NULL contract mirrors the siblings: mismatched dimensions or a NULL
  * element yield NULL. The null pre-scan is elided in codegen when both
  * child schemas declare containsNull=false.
  */
case class InnerProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "inner_product"

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
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
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
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InnerProduct =
    copy(left = newLeft, right = newRight)
}

object InnerProductFn {
  def innerProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(InnerProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
