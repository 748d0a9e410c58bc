package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, DoubleType, StructField, StructType}

/** Confidence bounds of a theta sketch, from the sketch's OWN error
  * estimator: `(estimate, lower, upper)` at 3 standard deviations
  * (the widest interval datasketches-java exposes, ~99.73% two-sided).
  *
  * Spark 4.1 ships `theta_sketch_agg`/`theta_sketch_estimate`/
  * `theta_intersection` but no bounds accessor, so a correctness gate
  * that checks "estimate within X% of exact" has to HARDCODE X — and a
  * fixed percentage is the wrong shape for intersections, whose relative
  * error grows as the overlap shrinks relative to the union (round-11
  * ADVICE on q77). `CompactSketch.getLowerBound/getUpperBound` carry the
  * correct distribution for any sampling-derived sketch, including set-
  * operation results, so a gate built on them is valid for ANY corpus
  * overlap profile rather than tuned to one scale factor.
  *
  * Accepts exactly the binary `theta_sketch_agg` / `theta_intersection`
  * emit (`CompactSketch.wrap`, the same deserialization Spark's own
  * `ThetaSketchEstimate` uses). CodegenFallback like Spark's sketch
  * expressions — this always runs on an already-aggregated (1-row scale)
  * frame, never in a per-record hot path.
  */
case class ThetaSketchBounds(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("estimate", DoubleType, nullable = false),
    StructField("lower3", DoubleType, nullable = false),
    StructField("upper3", DoubleType, nullable = false)))
  override def prettyName: String = "theta_sketch_bounds"

  override def nullSafeEval(bytes: Any): Any = {
    val sk = org.apache.datasketches.theta.CompactSketch.wrap(
      org.apache.datasketches.memory.Memory.wrap(
        bytes.asInstanceOf[Array[Byte]]))
    InternalRow(sk.getEstimate, sk.getLowerBound(3), sk.getUpperBound(3))
  }

  override protected def withNewChildInternal(
      newChild: Expression): ThetaSketchBounds = copy(child = newChild)
}

object ThetaSketchBoundsFn {
  def thetaSketchBounds(sketch: Column): Column =
    ExpressionUtils.column(ThetaSketchBounds(
      ExpressionUtils.expression(sketch)))
}
