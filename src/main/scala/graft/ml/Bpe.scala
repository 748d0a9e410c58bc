package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL 2016)
  * — the standard LLM-tokenizer construction, run as DataFrame aggregations.
  *
  * Shape at 100 TB: the corpus collapses ONCE to its word-frequency vocab
  * (the only full-corpus pass; everything after scales with |vocab|, which
  * Zipf keeps millions of times smaller than the corpus). Each merge round
  * is a pair-count aggregation over the vocab (map-side partial sums, one
  * tiny shuffle) plus one argmax row to the driver — the merge rule is
  * model state, exactly like k-means centroids — and a row-local rewrite of
  * the symbol sequences. No driver-side corpus, no per-round corpus scan.
  *
  * Determinism: ties in pair frequency break lexicographically on the pair,
  * so the learned merge table is a pure function of the corpus.
  *
  * Symbol sequences are separator-joined strings (U+0001 — absent from any
  * text column by construction); a merge is a left-to-right non-overlapping
  * replace of `a SEP b` with `ab`, the reference BPE merge semantics.
  */
object Bpe {

  private val SEP = "\u0001"

  final case class Merge(round: Int, left: String, right: String, count: Long)

  /** Character symbols of a word (Spark's regex split can emit a trailing
    * empty element — drop it). */
  private def chars(c: org.apache.spark.sql.Column) =
    array_remove(split(c, ""), "")

  /** (word, freq) vocab from a text column: the one corpus-wide pass. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Train `rounds` merges; returns the merge table (the tokenizer model)
    * and leaves the final segmentation recomputable via [[segment]]. */
  def train(vocab: DataFrame, rounds: Int): Seq[Merge] = {
    val spark = vocab.sparkSession
    import spark.implicits._
    // initial segmentation: every character its own symbol
    var seqs = vocab.select(col("word"), col("freq"),
      concat_ws(SEP, chars(col("word"))).as("seq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    seqs.count() // materialize before the loop
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    while (r < rounds) {
      val syms = split(col("seq"), SEP)
      val pairs = seqs
        .select(col("freq"), explode(
          zip_with(
            slice(syms, lit(1), size(syms) - 1),
            slice(syms, lit(2), size(syms) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
      // argmax with lexicographic tie-break — one row of model state
      val best = pairs.orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
        .as[(String, String, Long)].collect()
      if (best.isEmpty) return merges.toSeq // vocab fully merged
      val (l, rr, cnt) = best.head
      merges += Merge(r, l, rr, cnt)
      val next = seqs.withColumn("seq",
        // literal (non-regex) left-to-right non-overlapping replace
        replace(col("seq"), lit(s"$l$SEP$rr"), lit(l + rr)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize so the predecessor can release
      seqs.unpersist(blocking = false)
      seqs = next
      r += 1
    }
    seqs.unpersist(blocking = false)
    merges.toSeq
  }

  /** Apply a merge table to a word vocab: (word, freq, tokens ARRAY<STRING>).
    * Row-local — the merge table ships as literals. */
  def segment(vocab: DataFrame, merges: Seq[Merge]): DataFrame = {
    val seq0 = concat_ws(SEP, chars(col("word")))
    val seqN = merges.foldLeft(seq0) { (acc, m) =>
      replace(acc, lit(s"${m.left}$SEP${m.right}"), lit(m.left + m.right))
    }
    vocab.select(col("word"), col("freq"), split(seqN, SEP).as("tokens"))
  }
}
