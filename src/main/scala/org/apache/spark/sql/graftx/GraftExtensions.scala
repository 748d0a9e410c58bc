package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the native graft expressions
  * addressable from SQL (`SELECT cosine_similarity(a.e, b.e) ...`).
  *
  * Wire up with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=org.apache.spark.sql.graftx.GraftExtensions`;
  * [[GraftExtensions.register]] does the same on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    ext.injectOptimizerRule(_ => GlobalWindowRewrite)
    ext.injectOptimizerRule(_ => SummaryRewrite)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))),
    (new FunctionIdentifier("inner_product"),
      new ExpressionInfo(classOf[InnerProduct].getName, "inner_product"),
      (args: Seq[Expression]) => InnerProduct(args(0), args(1))),
    (new FunctionIdentifier("squared_distance"),
      new ExpressionInfo(classOf[SquaredDistance].getName, "squared_distance"),
      (args: Seq[Expression]) => SquaredDistance(args(0), args(1))),
    (new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (args: Seq[Expression]) => JaroWinkler(args(0), args(1))))

  /** Register on an already-built session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
    // sessions built without withExtensions get the optimizer rule via the
    // user-provided-optimizers batch (idempotent: gated off unless the
    // bucket-width conf is set, and it never fires twice on one join)
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraOptimizations.contains(RangeJoinRewrite)) {
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ RangeJoinRewrite
    }
    if (!classic.experimental.extraOptimizations.contains(GlobalWindowRewrite)) {
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ GlobalWindowRewrite
    }
    if (!classic.experimental.extraOptimizations.contains(SummaryRewrite)) {
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ SummaryRewrite
    }
    // the physical as-of join strategy, same late-registration path
    if (!classic.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      classic.experimental.extraStrategies =
        classic.experimental.extraStrategies :+ AsOfJoinStrategy
    }
  }
}
