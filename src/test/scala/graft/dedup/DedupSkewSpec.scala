package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Adversarial-skew stress for the fuzzy-dedup candidate path (round-7
  * verdict #5): a giant near-dup cluster — thousands of copies of one viral
  * doc — must flow through the band join via the frequency-cap path with
  * BOUNDED pair output, not explode one reducer with O(n²) rows, while
  * clustering semantics (one connected component containing every copy)
  * survive exactly. */
class DedupSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val nCopies = 10000

  def skewed = {
    // 10k exact copies of one doc (ids 0..9999) + distinct background docs
    // (ids 100000+): the background keeps normal buckets in play so the
    // capped path must coexist with the all-pairs path in one plan
    val viral = (0 until nCopies).map(i =>
      (i.toLong, "the same viral page body repeated verbatim across mirrors"))
    val background = (0 until 50).map(i =>
      (100000L + i, s"distinct background document number $i with its own words ${i * 7}"))
    (viral ++ background).toDF("doc_id", "text")
  }

  test("a 10k-copy cluster yields O(n) capped candidates, one component, bounded reducer input") {
    val cap = 64
    val pairs = Dedup.minhashCandidates(skewed, "doc_id", "text",
      maxBucket = cap).persist()
    try {
      val n = pairs.count()
      // star pairs per band for the viral bucket: ≤ (nCopies-1) per band ×
      // 4 bands, deduped to nCopies-1 distinct pairs; background buckets
      // are singletons. The uncapped join would emit ~50M pairs — assert
      // we stay 3 orders of magnitude under that.
      assert(n >= (nCopies - 1).toLong, s"every copy must pair somewhere: $n")
      assert(n < 50000L, s"capped candidate count must stay O(n), got $n")
      // all viral pairs anchor on the bucket minimum (star shape)
      val anchors = pairs.filter(col("id_b") < 100000L)
        .select("id_a").distinct().as[Long].collect().toSeq
      assert(anchors == Seq(0L),
        s"giant-bucket pairs must star on the bucket min id: $anchors")
      // clustering semantics survive: one component holding every copy
      val comp = Dedup.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      val viralComps = comp.filter(col("id") < 100000L)
        .select("component").distinct().as[Long].collect().toSeq
      assert(viralComps == Seq(0L),
        s"all copies must land in one component: $viralComps")
      assert(comp.filter(col("id") < 100000L).count() == nCopies.toLong)
    } finally pairs.unpersist()
  }

  test("below the cap the guarded join is bit-identical to all-pairs LSH") {
    // the DedupSpec fixture shape: two exact duplicates in a small corpus —
    // every bucket is far below any cap, so cap=2 vs cap=maxint must agree
    val docs = ((0 until 20).map(i =>
      (i.toLong, s"background document $i with words ${i * 13}")) ++
      Seq((10L + 100, "twin text shared by both copies of this document"),
        (11L + 100, "twin text shared by both copies of this document")))
      .toDF("doc_id", "text")
    val capped = Dedup.minhashCandidates(docs, "doc_id", "text", maxBucket = 2)
      .as[(Long, Long)].collect().toSet
    val unCapped = Dedup.minhashCandidates(docs, "doc_id", "text",
      maxBucket = Int.MaxValue).as[(Long, Long)].collect().toSet
    assert(capped == unCapped,
      s"sub-cap buckets must produce identical pairs: $capped vs $unCapped")
    assert(capped.contains((110L, 111L)), "the duplicate pair must surface")
  }
}
