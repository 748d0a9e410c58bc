package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch (KLL/MRL family — Karnin, Lang, Liberty 2016;
  * Manku, Rajagopalan, Lindsay 1998) over doubles, completing the
  * mergeable-sketch pair next to [[HllOps]]: HLL answers "how many
  * distinct", KLL answers "what is the p99" — both as persistable VALUES
  * that re-merge across partitions/days instead of rescanning 100 TB
  * (round-8 verdict #9).
  *
  * Structure: a ladder of buffers; level h holds items each representing
  * 2^h original values. Level 0 fills with raw values; a full level is
  * sorted and COMPACTED — every other element promoted to level h+1, the
  * rest discarded. The compaction offset alternates deterministically per
  * level (the MRL discipline) instead of flipping a random coin, so the
  * sketch is reproducible run-to-run; the price is the deterministic-bound
  * error O(log²(n/k)/k) rather than KLL's randomized O(1/k) — at k=256
  * and lake-realistic n both are far inside the ±5%-rank gate bound
  * (KllSpec pins ±1.5% at n=200k).
  *
  * All buffers are capacity-k, so a sketch holds ≤ k·log2(n/k) doubles —
  * 256·~16 = 4 KB-scale state per group, independent of n. `merge`
  * concatenates level-wise and re-compacts: associative up to compaction
  * order, with the rank-error bound holding under ANY merge tree — the
  * property that makes per-partition partial aggregation and cross-day
  * re-merge sound (the estimate may differ by < error bound between
  * partitionings; the GATE flags rank error, which is invariant).
  */
object KllOps {

  /** `levels(h)` = buffer of level h (weight 2^h each); `flips(h)` = that
    * level's alternating compaction offset. Kept as plain Seqs so Spark's
    * Product encoder serializes the aggregation buffer without Kryo. */
  final case class State(k: Int, levels: Seq[Seq[Double]], flips: Seq[Boolean])

  def empty(k: Int): State = State(k, Seq(Vector.empty), Seq(false))

  def update(s: State, v: Double): State =
    compact(s.copy(levels = s.levels.updated(0, s.levels.head :+ v)))

  def merge(a: State, b: State): State = {
    val n = math.max(a.levels.size, b.levels.size)
    def lvl(s: State, h: Int): Seq[Double] =
      if (h < s.levels.size) s.levels(h) else Vector.empty
    // flips: keep the larger sketch's parity so a merge with an empty
    // sketch is an exact no-op
    val big = if (a.levels.map(_.size).sum >= b.levels.map(_.size).sum) a else b
    compact(State(a.k,
      (0 until n).map(h => lvl(a, h) ++ lvl(b, h)),
      (0 until n).map(h => if (h < big.flips.size) big.flips(h) else false)))
  }

  /** Promote every full level upward until all fit in k. */
  private def compact(s0: State): State = {
    var levels = s0.levels.toVector
    var flips = s0.flips.toVector
    var h = 0
    while (h < levels.size) {
      if (levels(h).size >= s0.k) {
        val sorted = levels(h).sorted.toVector
        val off = if (flips(h)) 1 else 0
        flips = flips.updated(h, !flips(h))
        // WEIGHT CONSERVATION: promoting every other element doubles the
        // survivors' weight, which preserves total weight only for EVEN
        // buffers. Merge concatenation can leave an odd size — retain one
        // boundary element at this level (min or max by the same
        // alternating parity, so neither tail is systematically favored)
        // and compact the even remainder. q242's weight_ok gate pins
        // total weight == row count through the disk boundary.
        val (body, leftover) =
          if (sorted.size % 2 == 0) (sorted, Vector.empty[Double])
          else if (off == 0) (sorted.init, Vector(sorted.last))
          else (sorted.tail, Vector(sorted.head))
        val keep = body.indices.collect {
          case i if i % 2 == off => body(i)
        }
        if (h + 1 >= levels.size) { levels :+= Vector.empty; flips :+= false }
        levels = levels
          .updated(h, leftover)
          .updated(h + 1, levels(h + 1) ++ keep)
      }
      h += 1
    }
    State(s0.k, levels, flips)
  }

  /** Estimated q-quantile (q ∈ [0,1]): smallest item whose cumulative
    * weight reaches q·W over the weighted (item, 2^level) multiset. */
  def quantile(s: State, q: Double): Double = {
    val weighted = s.levels.zipWithIndex.flatMap { case (buf, h) =>
      buf.map(v => (v, 1L << h))
    }.sortBy(_._1)
    require(weighted.nonEmpty, "quantile of an empty sketch")
    val total = weighted.map(_._2).sum
    val target = q * total
    var acc = 0L
    var i = 0
    while (i < weighted.size) {
      acc += weighted(i)._2
      if (acc >= target) return weighted(i)._1
      i += 1
    }
    weighted.last._1
  }

  /** Total weight (= number of values fed), for rank audits. */
  def count(s: State): Long =
    s.levels.zipWithIndex.map { case (b, h) => b.size.toLong << h }.sum

  // ---- persisted form: int32 k | int32 nLevels | per level:
  // byte flip | int32 len | len × float64 (big-endian via DataOutput) ----

  def serialize(s: State): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(s.k); out.writeInt(s.levels.size)
    s.levels.zip(s.flips).foreach { case (buf, f) =>
      out.writeBoolean(f); out.writeInt(buf.size); buf.foreach(out.writeDouble)
    }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): State = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val k = in.readInt(); val n = in.readInt()
    require(k > 0 && n >= 0 && n < 64, s"corrupt KLL sketch header: k=$k n=$n")
    val pairs = (0 until n).map { _ =>
      val f = in.readBoolean()
      val len = in.readInt()
      (Vector.fill(len)(in.readDouble()), f)
    }
    State(k, pairs.map(_._1), pairs.map(_._2))
  }
}

/** Values in → persisted sketch out (the q218 lake-workflow shape: build
  * per-partition/day sketches once, store as a binary column). */
class KllSketchAggregator(k: Int = 256)
    extends Aggregator[Double, KllOps.State, Array[Byte]] {
  override def zero: KllOps.State = KllOps.empty(k)
  override def reduce(s: KllOps.State, v: Double): KllOps.State =
    KllOps.update(s, v)
  override def merge(a: KllOps.State, b: KllOps.State): KllOps.State =
    KllOps.merge(a, b)
  override def finish(s: KllOps.State): Array[Byte] = KllOps.serialize(s)
  override def bufferEncoder: org.apache.spark.sql.Encoder[KllOps.State] =
    org.apache.spark.sql.Encoders.product[KllOps.State]
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
}

/** Persisted sketches in → estimated quantiles out: the read side of the
  * rollup, fusing the re-merge and the estimate so a query needs no
  * driver-side deserialization. `finish` returns one estimate per
  * requested q (and the total weight last, for rank audits). */
class KllQuantileAggregator(k: Int, qs: Seq[Double])
    extends Aggregator[Array[Byte], KllOps.State, Seq[Double]] {
  override def zero: KllOps.State = KllOps.empty(k)
  override def reduce(acc: KllOps.State, sk: Array[Byte]): KllOps.State = {
    val s = KllOps.deserialize(sk)
    require(s.k == k, s"KLL k mismatch: sketch built with k=${s.k}, " +
      s"aggregator expects k=$k")
    KllOps.merge(acc, s)
  }
  override def merge(a: KllOps.State, b: KllOps.State): KllOps.State =
    KllOps.merge(a, b)
  override def finish(s: KllOps.State): Seq[Double] =
    qs.map(q => KllOps.quantile(s, q)) :+ KllOps.count(s).toDouble
  override def bufferEncoder: org.apache.spark.sql.Encoder[KllOps.State] =
    org.apache.spark.sql.Encoders.product[KllOps.State]
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** Persisted sketches in → re-merged sketch out (cross-day rollup). The
  * k consistency check mirrors HllMergeAggregator's precision guard: a
  * mixed-k merge would silently skew weights, so it fails loudly. */
class KllMergeAggregator(k: Int = 256)
    extends Aggregator[Array[Byte], KllOps.State, Array[Byte]] {
  override def zero: KllOps.State = KllOps.empty(k)
  override def reduce(acc: KllOps.State, sk: Array[Byte]): KllOps.State = {
    val s = KllOps.deserialize(sk)
    require(s.k == k, s"KLL k mismatch: sketch built with k=${s.k}, " +
      s"aggregator expects k=$k")
    KllOps.merge(acc, s)
  }
  override def merge(a: KllOps.State, b: KllOps.State): KllOps.State =
    KllOps.merge(a, b)
  override def finish(s: KllOps.State): Array[Byte] = KllOps.serialize(s)
  override def bufferEncoder: org.apache.spark.sql.Encoder[KllOps.State] =
    org.apache.spark.sql.Encoders.product[KllOps.State]
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
}
