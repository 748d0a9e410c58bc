package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

/** Pins the round-16 pair-mine memo (DedupQueries.pairCache):
  *  1. a memo hit returns EXACTLY the fresh compute's rows and schema —
  *     the memo is common-subexpression elimination, never a semantic
  *     change (the oracle gate rides on this);
  *  2. the plan-normalization means a bare-table corpus and the same
  *     corpus pre-projected to the four mined columns share one entry;
  *  3. constructed (non-file-backed) corpora BYPASS the memo entirely —
  *     LocalRelation prints no data in its canonical plan, so two
  *     same-schema spec corpora would otherwise collide on the key. */
class PairMemoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("memo hit == fresh compute on a file-backed corpus (rows + schema)") {
    val docs = Tables.load(spark, sf, "documents")
    def sorted(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq.toVector).sortBy(_.mkString("|")).toSeq
    val freshDf = DedupQueries.ngramPairsWithCandidates(
      docs.select("doc_id", "lang", "n_chars", "text"), 0.7)._2
    val fresh = sorted(freshDf)
    // first call populates the memo; second (pre-projected) must hit the
    // SAME entry via optimized-plan canonicalization and return the same
    val first = DedupQueries.ngramPairs(docs, 0.7)
    val second = DedupQueries.ngramPairs(
      docs.select("doc_id", "lang", "n_chars", "text"), 0.7)
    assert(fresh.nonEmpty, "fixture corpus must mine at least one pair")
    assert(sorted(first) == fresh)
    assert(sorted(second) == fresh)
    assert(first.schema == freshDf.schema)
    assert(second.schema == freshDf.schema)
  }

  test("constructed corpora bypass the memo (no cross-corpus collision)") {
    import spark.implicits._
    // two corpora with IDENTICAL schema and shape but different ids and
    // text — if the memo keyed them, the second mine would return the
    // first's ids
    val a = Seq((1L, "en", 25, "aaaaaaaaaabbbbbbbbbbccccc"),
      (2L, "en", 25, "aaaaaaaaaabbbbbbbbbbccccc"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val b = Seq((10L, "en", 25, "zzzzzzzzzzyyyyyyyyyyxxxxx"),
      (20L, "en", 25, "zzzzzzzzzzyyyyyyyyyyxxxxx"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val pa = DedupQueries.ngramPairs(a, 0.7).collect()
    val pb = DedupQueries.ngramPairs(b, 0.7).collect()
    assert(pa.length == 1 && pa.head.getLong(0) == 1L &&
      pa.head.getLong(1) == 2L)
    assert(pb.length == 1 && pb.head.getLong(0) == 10L &&
      pb.head.getLong(1) == 20L)
  }
}
