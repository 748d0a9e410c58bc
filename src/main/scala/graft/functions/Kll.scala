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
  *
  * Two representations share ONE compaction implementation
  * ([[KllOps.compactInPlace]]):
  *  - [[KllOps.State]] — immutable, for the persisted form, the streaming
  *    sketch-in-state path, and the property specs;
  *  - [[KllBuf]] — a mutable array-backed aggregation buffer. The hot
  *    per-row `update` path writes one array slot and bumps a counter —
  *    ZERO allocation per row (round-9 verdict #3; the old path copied the
  *    whole immutable State per input value). Allocation happens only on
  *    compaction (≤ n/k times), level growth (log n times), and merge
  *    (once per partition boundary).
  */
object KllOps {

  /** `levels(h)` = buffer of level h (weight 2^h each); `flips(h)` = that
    * level's alternating compaction offset. Kept as plain Seqs so Spark's
    * Product encoder serializes it without Kryo. */
  final case class State(k: Int, levels: Seq[Seq[Double]], flips: Seq[Boolean])

  def empty(k: Int): State = State(k, Seq(Vector.empty), Seq(false))

  def update(s: State, v: Double): State = {
    val b = stateToBuf(s)
    updateBuf(b, v)
    bufToState(b)
  }

  def merge(a: State, b: State): State = {
    require(a.k == b.k,
      s"KLL k mismatch in merge: ${a.k} vs ${b.k} — merging sketches of " +
        "different k silently skews weights; rebuild with a common k")
    bufToState(mergeBuf(stateToBuf(a), stateToBuf(b)))
  }

  // ---- mutable buffer path (the aggregators' hot loop) ----

  def newBuf(k: Int): KllBuf =
    KllBuf(k, Array(new Array[Double](k)), Array(0), Array(false))

  /** Append one value in place: one array store + counter bump; compaction
    * only when level 0 reaches k (all levels are < k between calls). */
  def updateBuf(b: KllBuf, v: Double): Unit = {
    b.levels(0)(b.sizes(0)) = v
    b.sizes(0) += 1
    if (b.sizes(0) >= b.k) compactInPlace(b)
  }

  /** Level-wise concatenation into a fresh buffer, flips taken from the
    * larger sketch (so merging with an empty sketch is an exact no-op),
    * then one compaction pass — byte-identical results to compacting the
    * concatenated immutable State. */
  def mergeBuf(a: KllBuf, b: KllBuf): KllBuf = {
    require(a.k == b.k,
      s"KLL k mismatch in merge: ${a.k} vs ${b.k} — merging sketches of " +
        "different k silently skews weights; rebuild with a common k")
    val n = math.max(a.levels.length, b.levels.length)
    def size(s: KllBuf, h: Int): Int = if (h < s.sizes.length) s.sizes(h) else 0
    val aTot = a.sizes.sum
    val bTot = b.sizes.sum
    val big = if (aTot >= bTot) a else b
    val levels = new Array[Array[Double]](n)
    val sizes = new Array[Int](n)
    val flips = new Array[Boolean](n)
    var h = 0
    while (h < n) {
      val m = size(a, h) + size(b, h)
      val arr = new Array[Double](math.max(a.k, m))
      if (h < a.levels.length)
        System.arraycopy(a.levels(h), 0, arr, 0, a.sizes(h))
      if (h < b.levels.length)
        System.arraycopy(b.levels(h), 0, arr, size(a, h), b.sizes(h))
      levels(h) = arr
      sizes(h) = m
      flips(h) = h < big.flips.length && big.flips(h)
      h += 1
    }
    val out = KllBuf(a.k, levels, sizes, flips)
    compactInPlace(out)
    out
  }

  /** Promote every full level upward until all fit in k. Single shared
    * implementation for both representations. */
  private def compactInPlace(b: KllBuf): Unit = {
    var h = 0
    while (h < b.levels.length) {
      if (b.sizes(h) >= b.k) {
        val n = b.sizes(h)
        val arr = b.levels(h)
        java.util.Arrays.sort(arr, 0, n)
        val off = if (b.flips(h)) 1 else 0
        b.flips(h) = !b.flips(h)
        // WEIGHT CONSERVATION: promoting every other element doubles the
        // survivors' weight, which preserves total weight only for EVEN
        // buffers. Merge concatenation can leave an odd size — retain one
        // boundary element at this level (min or max by the same
        // alternating parity, so neither tail is systematically favored)
        // and compact the even remainder. q242's weight_ok gate pins
        // total weight == row count through the disk boundary.
        var start = 0
        var end = n
        var leftover = 0.0
        var hasLeftover = false
        if (n % 2 != 0) {
          hasLeftover = true
          if (off == 0) { end = n - 1; leftover = arr(n - 1) }
          else { start = 1; leftover = arr(0) }
        }
        val body = end - start // even
        val nKeep = body / 2
        if (h + 1 >= b.levels.length) {
          b.levels = b.levels :+ new Array[Double](b.k)
          b.sizes = b.sizes :+ 0
          b.flips = b.flips :+ false
        }
        val needed = b.sizes(h + 1) + nKeep
        if (needed > b.levels(h + 1).length) {
          b.levels(h + 1) = java.util.Arrays.copyOf(
            b.levels(h + 1), math.max(needed, 2 * b.levels(h + 1).length))
        }
        val dst = b.levels(h + 1)
        var w = b.sizes(h + 1)
        var j = off
        while (j < body) { dst(w) = arr(start + j); w += 1; j += 2 }
        b.sizes(h + 1) = w
        if (hasLeftover) { arr(0) = leftover; b.sizes(h) = 1 }
        else b.sizes(h) = 0
      }
      h += 1
    }
  }

  def stateToBuf(s: State): KllBuf = {
    val levels = new Array[Array[Double]](s.levels.size)
    val sizes = new Array[Int](s.levels.size)
    var h = 0
    s.levels.foreach { buf =>
      val arr = new Array[Double](math.max(s.k, buf.size))
      var i = 0
      buf.foreach { v => arr(i) = v; i += 1 }
      levels(h) = arr
      sizes(h) = i
      h += 1
    }
    KllBuf(s.k, levels, sizes, s.flips.toArray)
  }

  def bufToState(b: KllBuf): State =
    State(b.k,
      b.levels.indices.map(h => b.levels(h).take(b.sizes(h)).toVector),
      b.flips.toVector)

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
    var remaining = bytes.length - 8
    val pairs = (0 until n).map { _ =>
      val f = in.readBoolean()
      val len = in.readInt()
      remaining -= 5
      // A compacted level never exceeds k items, and a hostile/corrupt len
      // must not drive an unbounded allocation: bound it by BOTH the
      // invariant and the bytes actually present.
      require(len >= 0 && len <= k && len.toLong * 8 <= remaining,
        s"corrupt KLL sketch level: len=$len k=$k remaining=$remaining")
      remaining -= len * 8
      (Vector.fill(len)(in.readDouble()), f)
    }
    State(k, pairs.map(_._1), pairs.map(_._2))
  }
}

/** Mutable array-backed aggregation buffer: level h occupies
  * `levels(h)(0 until sizes(h))`; spare capacity beyond `sizes(h)` is
  * scratch. A case class of primitive arrays so `Encoders.product` gives
  * it a struct encoding — Spark's typed-aggregate path then holds it as a
  * live JVM object between rows and only encodes it at partial-output
  * boundaries, which is what makes the in-place update free. */
final case class KllBuf(
    k: Int,
    var levels: Array[Array[Double]],
    var sizes: Array[Int],
    var flips: Array[Boolean])

/** Values in → persisted sketch out (the q218 lake-workflow shape: build
  * per-partition/day sketches once, store as a binary column). */
class KllSketchAggregator(k: Int = 256)
    extends Aggregator[Double, KllBuf, Array[Byte]] {
  override def zero: KllBuf = KllOps.newBuf(k)
  override def reduce(b: KllBuf, v: Double): KllBuf = {
    KllOps.updateBuf(b, v); b
  }
  override def merge(a: KllBuf, b: KllBuf): KllBuf = KllOps.mergeBuf(a, b)
  override def finish(b: KllBuf): Array[Byte] =
    KllOps.serialize(KllOps.bufToState(b))
  override def bufferEncoder: org.apache.spark.sql.Encoder[KllBuf] =
    org.apache.spark.sql.Encoders.product[KllBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
}

/** Persisted sketches in → estimated quantiles out: the read side of the
  * rollup, fusing the re-merge and the estimate so a query needs no
  * driver-side deserialization. `finish` returns one estimate per
  * requested q (and the total weight last, for rank audits). */
class KllQuantileAggregator(k: Int, qs: Seq[Double])
    extends Aggregator[Array[Byte], KllBuf, Seq[Double]] {
  override def zero: KllBuf = KllOps.newBuf(k)
  override def reduce(acc: KllBuf, sk: Array[Byte]): KllBuf = {
    val s = KllOps.deserialize(sk)
    require(s.k == k, s"KLL k mismatch: sketch built with k=${s.k}, " +
      s"aggregator expects k=$k")
    KllOps.mergeBuf(acc, KllOps.stateToBuf(s))
  }
  override def merge(a: KllBuf, b: KllBuf): KllBuf = KllOps.mergeBuf(a, b)
  override def finish(b: KllBuf): Seq[Double] = {
    val s = KllOps.bufToState(b)
    qs.map(q => KllOps.quantile(s, q)) :+ KllOps.count(s).toDouble
  }
  override def bufferEncoder: org.apache.spark.sql.Encoder[KllBuf] =
    org.apache.spark.sql.Encoders.product[KllBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

/** Persisted sketches in → re-merged sketch out (cross-day rollup). The
  * k consistency check mirrors HllMergeAggregator's precision guard: a
  * mixed-k merge would silently skew weights, so it fails loudly. */
class KllMergeAggregator(k: Int = 256)
    extends Aggregator[Array[Byte], KllBuf, Array[Byte]] {
  override def zero: KllBuf = KllOps.newBuf(k)
  override def reduce(acc: KllBuf, sk: Array[Byte]): KllBuf = {
    val s = KllOps.deserialize(sk)
    require(s.k == k, s"KLL k mismatch: sketch built with k=${s.k}, " +
      s"aggregator expects k=$k")
    KllOps.mergeBuf(acc, KllOps.stateToBuf(s))
  }
  override def merge(a: KllBuf, b: KllBuf): KllBuf = KllOps.mergeBuf(a, b)
  override def finish(b: KllBuf): Array[Byte] =
    KllOps.serialize(KllOps.bufToState(b))
  override def bufferEncoder: org.apache.spark.sql.Encoder[KllBuf] =
    org.apache.spark.sql.Encoders.product[KllBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
}
