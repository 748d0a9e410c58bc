package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Single-node reference BPE: same semantics (char symbols, most-frequent
    * adjacent pair, lexicographic tie-break, left-to-right non-overlapping
    * merge), plain collections. */
  private def referenceBpe(vocab: Map[String, Long], rounds: Int): Seq[(String, String, Long)] = {
    var seqs: Map[Vector[String], Long] =
      vocab.groupBy { case (w, _) => w.map(_.toString).toVector }
        .view.mapValues(_.values.sum).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 0 until rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((seq, f) <- seqs; i <- 0 until seq.length - 1)
        counts((seq(i), seq(i + 1))) = counts.getOrElse((seq(i), seq(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        seqs = seqs.groupBy { case (seq, _) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < seq.length) {
            if (i + 1 < seq.length && seq(i) == l && seq(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += seq(i); i += 1 }
          }
          b.result()
        }.view.mapValues(_.values.sum).toMap
      }
    }
    out.toSeq
  }

  test("distributed merge table equals the single-node reference, including ties") {
    import spark.implicits._
    val docs = Seq(
      "the cat sat on the mat",
      "the rat sat on the cat",
      "a cat and a rat and a bat",
      "low lower lowest slow slower",
      "banana bandana ban"
    ).toDF("text")
    val vocabDf = Bpe.wordVocab(docs, "text")
    val vocab = vocabDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Bpe.train(vocabDf, rounds = 10).map(m => (m.left, m.right, m.count))
    val want = referenceBpe(vocab, 10)
    assert(got == want, s"merge tables differ:\n got=$got\nwant=$want")
  }

  test("segmentation with the learned merges reassembles every word exactly") {
    import spark.implicits._
    val docs = Seq("abab ababab baba", "aa aaa aaaa").toDF("text")
    val vocabDf = Bpe.wordVocab(docs, "text")
    val merges = Bpe.train(vocabDf, rounds = 5)
    val seg = Bpe.segment(vocabDf, merges)
      .select(org.apache.spark.sql.functions.col("word"),
        org.apache.spark.sql.functions.concat_ws("",
          org.apache.spark.sql.functions.col("tokens")).as("joined"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.col("tokens")).as("n"))
      .collect()
    seg.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"tokens must concatenate back to the word: $r")
      assert(r.getInt(2) >= 1 && r.getInt(2) <= r.getString(0).length)
    }
    // merges actually compress: some word must segment to fewer symbols
    // than characters
    assert(seg.exists(r => r.getInt(2) < r.getString(0).length),
      "after 5 rounds at least one word must be compressed")
  }

  test("overlapping-run merge follows left-to-right non-overlapping semantics") {
    import spark.implicits._
    // 'aaaa': pair (a,a) counts 3; merging left-to-right gives [aa][aa],
    // never [a][aa][a] — the reference BPE behavior
    val docs = Seq("aaaa").toDF("text")
    val vocabDf = Bpe.wordVocab(docs, "text")
    val merges = Bpe.train(vocabDf, rounds = 1)
    assert(merges.map(m => (m.left, m.right, m.count)) == Seq(("a", "a", 3L)))
    val seg = Bpe.segment(vocabDf, merges).collect().head.getSeq[String](2)
    assert(seg == Seq("aa", "aa"), s"got $seg")
  }

  test("merge never matches a symbol suffix across a boundary") {
    import spark.implicits._
    // After (t,h) then (th,e), "there" is [the, r, e]. A later (e,r) rule
    // must NOT fire: the only 'e' adjacent to 'r' is the SUFFIX of symbol
    // "the". A string-level replace of "e SEP r" would corrupt this to
    // [ther, e]; token-level semantics leave it unchanged.
    val docs = Seq("there").toDF("text")
    val vocab = Bpe.wordVocab(docs, "text")
    val merges = Seq(
      Bpe.Merge(0, "t", "h", 1L),
      Bpe.Merge(1, "th", "e", 1L),
      Bpe.Merge(2, "e", "r", 1L))
    val seg = Bpe.segment(vocab, merges).collect().head.getSeq[String](2)
    assert(seg == Seq("the", "r", "e"), s"suffix collision: got $seg")
    // and the genuine (e,r) adjacency still merges
    val docs2 = Seq("her").toDF("text")
    val seg2 = Bpe.segment(Bpe.wordVocab(docs2, "text"),
      Seq(Bpe.Merge(0, "e", "r", 1L))).collect().head.getSeq[String](2)
    assert(seg2 == Seq("h", "er"), s"got $seg2")
  }
}
