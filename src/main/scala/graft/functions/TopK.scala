package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k state: parallel primitive arrays kept ascending by
  * (score, id-desc) so the worst element is slot 0 — product-encodable, no
  * kryo, no boxing in the Tungsten buffer. */
final case class TopKBuf(scores: Array[Double], ids: Array[Long])

/** Typed top-k-by-score aggregator (SURVEY.md §7.3's anticipated custom
  * Catalyst aggregate): keeps the k best (score desc, id asc) pairs in a
  * bounded buffer.
  *
  * Scale rationale vs the ranking-window formulation: a window must shuffle
  * and SORT every row of a group before row_number can cut at k; this
  * aggregator is a partial+final aggregate — each map task reduces its rows
  * to ≤k locally (O(n·k) with k bounded), and only k-sized buffers cross the
  * shuffle. At 100 TB per-group data that is the difference between shuffling
  * the corpus and shuffling kilobytes.
  *
  * Input rows are (groupKey-independent) `(score, id)`; output is the top-k
  * as ordered parallel arrays.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), TopKBuf, Seq[(Double, Long)]] {

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  /** true if (s1,id1) ranks WORSE than (s2,id2) under (score desc, id asc). */
  private def worse(s1: Double, id1: Long, s2: Double, id2: Long): Boolean =
    s1 < s2 || (s1 == s2 && id1 > id2)

  private def insert(b: TopKBuf, s: Double, id: Long): TopKBuf = {
    val n = b.scores.length
    if (n == k && worse(s, id, b.scores(0), b.ids(0))) return b
    val m = if (n < k) n + 1 else n
    val ss = new Array[Double](m); val is = new Array[Long](m)
    // merge-insert keeping ascending-by-rank-worst-first order
    var src = if (n == k) 1 else 0 // drop current worst if full
    var dst = 0
    var placed = false
    while (src < n) {
      if (!placed && worse(s, id, b.scores(src), b.ids(src))) {
        ss(dst) = s; is(dst) = id; placed = true; dst += 1
      }
      ss(dst) = b.scores(src); is(dst) = b.ids(src); dst += 1; src += 1
    }
    if (!placed) { ss(dst) = s; is(dst) = id }
    TopKBuf(ss, is)
  }

  override def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf =
    insert(b, a._1, a._2)

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    var acc = b1
    var i = 0
    while (i < b2.scores.length) {
      acc = insert(acc, b2.scores(i), b2.ids(i)); i += 1
    }
    acc
  }

  /** Best-first (score desc, id asc). */
  override def finish(b: TopKBuf): Seq[(Double, Long)] =
    b.scores.zip(b.ids).reverse.toSeq

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
