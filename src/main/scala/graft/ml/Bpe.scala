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
  * text column by construction); a merge is the left-to-right
  * non-overlapping TOKEN-level fold of [[mergeFold]]. A naive string
  * `replace(seq, l+SEP+r, l+r)` is NOT equivalent: it matches `l` as the
  * SUFFIX of a longer symbol (merges th+e then e+r corrupt "the|r|e" into
  * "ther|e" where token-level semantics leave [the, r, e]) - the classic
  * boundary bug BpeSpec's suffix-collision case pins.
  */
object Bpe {

  private val SEP = "\u0001"

  final case class Merge(round: Int, left: String, right: String, count: Long)

  /** One merge rule applied to a SEP-joined symbol string with exact
    * left-to-right non-overlapping TOKEN semantics, as a single fold:
    * walking symbols left to right, append `r` WITHOUT a separator when
    * the accumulator's last complete symbol is `l` (so tail `...SEP l` +
    * `r` becomes the merged symbol `...SEP lr`), else append `SEP x`. The
    * tail check `acc == l OR acc.endsWith(SEP+l)` matches whole symbols
    * only - a tail symbol merely ENDING in l has no separator before its
    * final l - and a just-merged tail (`lr`) can never equal `l`, which is
    * exactly the skip-the-merged-pair rule. Identical semantics are
    * expressible in DuckDB as `list_reduce` over `string_split(seq,
    * chr(1))`, which is how the q120/q121 oracles mirror it. */
  def mergeFold(seq: org.apache.spark.sql.Column, l: String, r: String)
      : org.apache.spark.sql.Column =
    // The input expression appears exactly ONCE (empty-string sentinel
    // init instead of slice/element_at/size, which would reference it
    // three times): q121 nests 15 rules, and a 3-reference fold explodes
    // to 3^15 expression nodes (measured: OOMs the driver); this form
    // grows linearly. "" is safe as the sentinel - symbols are never
    // empty.
    aggregate(
      split(seq, SEP), lit(""),
      (acc, x) => when(acc === lit(""), x)
        .otherwise(when(
          (acc === lit(l) || acc.endsWith(SEP + l)) && x === lit(r),
          concat(acc, lit(r)))
          .otherwise(concat(acc, lit(SEP), x))))

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
      val next = seqs.withColumn("seq", mergeFold(col("seq"), l, rr))
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
      mergeFold(acc, m.left, m.right)
    }
    vocab.select(col("word"), col("freq"), split(seqN, SEP).as("tokens"))
  }
}
