package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Mergeable HyperLogLog sketch aggregator (Flajolet et al. 2007) over
  * pre-hashed 64-bit inputs.
  *
  * Spark ships `approx_count_distinct` (HLL++), but its sketch lives and
  * dies inside one aggregation — it cannot be persisted per partition/day
  * and re-merged later, which is the whole point of sketches in a lake
  * (dashboards union yesterday's sketches instead of rescanning 100 TB).
  * This aggregator makes the sketch a first-class VALUE: the buffer is the
  * dense register array, `merge` is element-wise max — associative and
  * commutative, so partial aggregation, shuffle order, and cross-day
  * re-merge all give byte-identical sketches (HllSpec pins repartition
  * invariance at 1/8/32 partitions).
  *
  * p=12 → m=4096 registers, one byte each; standard error 1.04/√m ≈ 1.6%.
  * Inputs must already be uniform 64-bit hashes — compose with Spark's
  * codegen'd `xxhash64` so hashing stays in the scan stage and the
  * aggregator is type-agnostic.
  */
class HllAggregator(p: Int = 12)
    extends Aggregator[Long, Array[Byte], Long] {
  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(regs: Array[Byte], hash: Long): Array[Byte] = {
    val idx = (hash >>> (64 - p)).toInt
    // rank = leading zeros of the remaining (64-p)-bit suffix, +1; the
    // suffix is shifted left so zeros past its end cannot inflate the rank
    val w = hash << p
    val rank = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > (regs(idx) & 0xff)) regs(idx) = rank.toByte
    regs
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(regs: Array[Byte]): Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / m) // p >= 7 constant
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xff
      sum += 1.0 / (1L << r).toDouble
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / sum
    // small-range correction: linear counting while registers are sparse
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
    math.round(corrected)
  }

  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
  override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}
