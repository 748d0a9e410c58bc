package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Column-API bridge to Spark's own bloom-filter sketch expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind runtime-filter join pruning, not exposed as public functions).
  *
  * The 100 TB use: a membership screen against a reference set too large
  * to broadcast as data. A bloom over n items at ~10 bits/item is ~1.2%
  * false-positive and ~n bytes — 10⁸ benchmark shingles become a ~120 MB
  * sidecar instead of a multi-GB broadcast set, and probing is a pure
  * narrow scan (no join at all). False positives only: anything the
  * screen drops is PROVABLY in the reference set's bloom, so a
  * contamination screen errs toward dropping — the safe direction.
  *
  * Values are hashed to longs with the same XxHash64 the aggregate's
  * runtime-filter callers use; build and probe must share this hashing.
  */
object BloomFilterFunctions {

  /** Aggregate a column into a serialized bloom filter (binary). */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      new XxHash64(Seq(ExpressionUtils.expression(c))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Probe a driver-held serialized bloom (the model-artifact pattern:
    * the filter ships as a literal into codegen, deserialized once per
    * task, never per row). */
  def mightContain(bloomBytes: Array[Byte], c: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      new XxHash64(Seq(ExpressionUtils.expression(c)))))
}
