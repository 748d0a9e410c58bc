package graft.functions

import org.apache.spark.sql.Column

/** Column-facing wrappers for the native sketch expressions. */
object SketchFunctions {

  /** `(estimate, lower3, upper3)` of a theta sketch from its own error
    * estimator (see org.apache.spark.sql.graftx.ThetaSketchBounds) —
    * the bounds accessor Spark's built-in theta functions lack. */
  def thetaBounds(sketch: Column): Column =
    org.apache.spark.sql.graftx.ThetaSketchBoundsFn.thetaSketchBounds(sketch)
}
