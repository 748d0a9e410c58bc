package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the latest right row with the same
  * key and an event time at or before the left row's — the time-series
  * lookup Spark has no built-in operator for.
  *
  * Implementation is the single-pass union+window technique (preference (a)
  * of the custom-operator ladder: compose built-ins): tag both sides, sort
  * each key group once by (ts, side, tiebreak), and carry the last non-null
  * right payload forward with `last(..., ignoreNulls)`. One shuffle on the
  * key, O(n log n) per group, and — unlike the naive range join — zero row
  * explosion regardless of how many right rows precede a left row.
  */
object AsOfJoin {

  /** @param right payload frame; all its non-key/ts columns are attached
    * @param tiebreak column ordering right rows within an equal timestamp
    *                 (the latest wins deterministically) */
  def joinPrior(left: DataFrame, right: DataFrame,
      key: String, tsLeft: String, tsRight: String,
      tiebreak: Column): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(c => c == key || c == tsRight)
    val payload = struct(rightPayloadCols.map(col): _*)

    val taggedRight = right.select(
      col(key), col(tsRight).as("__ts"), lit(0).as("__side"),
      tiebreak.as("__tb"), payload.as("__payload"))
    val taggedLeft = left.select(
      col(key), col(tsLeft).as("__ts"), lit(1).as("__side"),
      lit(null).cast(taggedRight.schema("__tb").dataType).as("__tb"),
      lit(null).cast(taggedRight.schema("__payload").dataType).as("__payload"),
      struct(left.columns.map(col): _*).as("__left"))
    val unioned = taggedRight.withColumn("__left",
      lit(null).cast(taggedLeft.schema("__left").dataType))
      .unionByName(taggedLeft)

    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__side"), col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__prior", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__left.*") +:
        rightPayloadCols.map(c => col(s"__prior.$c").as(s"prior_$c")): _*)
  }
}
