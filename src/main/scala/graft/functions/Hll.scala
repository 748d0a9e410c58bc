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
object HllOps {
  def update(regs: Array[Byte], hash: Long, p: Int): Array[Byte] = {
    val idx = (hash >>> (64 - p)).toInt
    // rank = leading zeros of the remaining (64-p)-bit suffix, +1; the
    // suffix is shifted left so zeros past its end cannot inflate the rank
    val w = hash << p
    val rank = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > (regs(idx) & 0xff)) regs(idx) = rank.toByte
    regs
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    // Register-count mismatch = sketches built at different precisions.
    // Element-wise max over the shorter length would silently truncate the
    // longer sketch into a wrong estimate (and a shorter `b` would throw
    // AIOOBE mid-loop) — fail loudly instead (round-8 ADVICE #5).
    require(a.length == b.length,
      s"HLL precision mismatch: cannot merge ${a.length}- and " +
        s"${b.length}-register sketches")
    var i = 0
    while (i < a.length) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
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
    if (e <= 2.5 * m && zeros > 0) math.round(m * math.log(m.toDouble / zeros))
    else math.round(e)
  }
}

class HllAggregator(p: Int = 12)
    extends Aggregator[Long, Array[Byte], Long] {
  override def zero: Array[Byte] = new Array[Byte](1 << p)
  override def reduce(regs: Array[Byte], hash: Long): Array[Byte] =
    HllOps.update(regs, hash, p)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllOps.merge(a, b)
  override def finish(regs: Array[Byte]): Long = HllOps.estimate(regs)
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
  override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}

/** The sketch AS A VALUE: aggregate to the raw register array so it can be
  * persisted (a parquet binary column) and re-merged in a later job —
  * the lake workflow q218 gates end-to-end. */
class HllSketchAggregator(p: Int = 12)
    extends Aggregator[Long, Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = new Array[Byte](1 << p)
  override def reduce(regs: Array[Byte], hash: Long): Array[Byte] =
    HllOps.update(regs, hash, p)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllOps.merge(a, b)
  override def finish(regs: Array[Byte]): Array[Byte] = regs
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
}

/** Re-merge persisted sketches (binary column in, estimate out). */
class HllMergeAggregator(p: Int = 12)
    extends Aggregator[Array[Byte], Array[Byte], Long] {
  override def zero: Array[Byte] = new Array[Byte](1 << p)
  override def reduce(acc: Array[Byte], sk: Array[Byte]): Array[Byte] = {
    // a persisted sketch column can carry any history — validate the
    // precision up front so a p-mismatch surfaces as a clear error, not an
    // index crash or a silently-truncated estimate
    require(sk.length == (1 << p),
      s"persisted sketch has ${sk.length} registers, expected ${1 << p} " +
        s"(precision p=$p)")
    HllOps.merge(acc, sk)
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllOps.merge(a, b)
  override def finish(regs: Array[Byte]): Long = HllOps.estimate(regs)
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
  override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}
