package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.functions.VectorOps

/** Pair-finding correctness for the dedup primitives on constructed
  * near-duplicates (the synthetic corpus has none). */
class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val base = "the quick brown fox jumps over the lazy dog and runs far away " +
    "into the deep green forest while the sun sets slowly behind the hills"
  val nearDup = base.replace("slowly", "quickly") // one word changed
  val unrelated = "completely different content about database engines " +
    "columnar storage vectorized execution query optimization and shuffles " +
    "partitioning broadcast joins adaptive planning codegen pipelines"

  val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated))
    .toDF("doc_id", "text")

  test("minhash LSH finds the constructed near-dup pair and not unrelated pairs") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "near-dup pair must collide in some band")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "unrelated docs must not be candidates")
  }

  test("simhash hamming distance separates near-dups from unrelated docs") {
    val sh = docs.select($"doc_id", Dedup.simhash($"text").as("sh"))
    val m = sh.as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(m(a) ^ m(b))
    assert(ham(1, 2) <= 8, s"near-dup hamming ${ham(1, 2)} should be small")
    assert(ham(1, 3) > 12, s"unrelated hamming ${ham(1, 3)} should be large")
  }

  test("ngram jaccard is high for near-dups, low for unrelated") {
    val g = docs.select($"doc_id", Dedup.charNgrams($"text").as("gs"))
    val j = g.as("a").join(g.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id",
        Dedup.jaccard($"a.gs", $"b.gs").as("j"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(j((1L, 2L)) > 0.8)
    assert(j((1L, 3L)) < 0.3)
  }

  test("sign-LSH buckets collide for nearly identical vectors") {
    val rnd = new java.util.Random(7)
    val v = Array.fill(64)(rnd.nextGaussian().toFloat)
    val vNear = v.clone(); vNear(0) = vNear(0) + 0.001f
    val vFar = Array.fill(64)(rnd.nextGaussian().toFloat)
    val df = Seq((1L, v.toSeq), (2L, vNear.toSeq), (3L, vFar.toSeq))
      .toDF("vec_id", "embedding")
    val planes = VectorOps.hyperplanes(nBits = 12, dim = 64)
    val b = df.select($"vec_id",
        VectorOps.lshBucket($"embedding", planes).as("bucket"))
      .as[(Long, Long)].collect().toMap
    assert(b(1L) == b(2L), "near-identical vectors share a bucket")
    assert(b(1L) != b(3L), "random vector lands elsewhere (w.h.p. at 12 bits)")
  }

  test("signature invariants: identical texts collide everywhere, jaccard is reflexive") {
    val dup = Seq((10L, base), (11L, base)).toDF("doc_id", "text")
    val sigs = dup.select($"doc_id",
        Dedup.minhashSignature($"text", 16).as("sig"),
        Dedup.bandKeys(Dedup.minhashSignature($"text", 16)).as("bands"),
        Dedup.simhash($"text").as("sh"))
      .collect()
    assert(sigs(0).getSeq[Long](1) == sigs(1).getSeq[Long](1),
      "identical text -> identical minhash signature")
    assert(sigs(0).getSeq[Long](2) == sigs(1).getSeq[Long](2),
      "identical text -> identical band keys (collides in every band)")
    assert(sigs(0).getLong(3) == sigs(1).getLong(3),
      "identical text -> identical simhash")
    assert(sigs(0).getSeq[Long](1).length == 16)
    val j = dup.limit(1).select(
      Dedup.jaccard(Dedup.charNgrams($"text"), Dedup.charNgrams($"text")))
      .as[Double].collect().head
    assert(j == 1.0, "jaccard(a, a) == 1")
    // and the LSH candidate pair surfaces for the exact duplicate
    val pairs = Dedup.minhashCandidates(dup, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L)))
  }

  test("connectedComponents labels chains, stars, and islands correctly") {
    // chain 1-2-3-4 (diameter 3: needs >1 propagation round), star 10<-{11,12,13},
    // island pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (11L, 10L), (12L, 10L), (13L, 10L), (20L, 21L))
      .toDF("src", "dst")
    val got = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents converges on a 1000-node path in O(log n) rounds") {
    // Worst case for plain min-label propagation: a single path of diameter
    // 999 would need ~999 rounds. Pointer doubling must close it in
    // ~log2(1000) ≈ 10 — cap at 12 and let the convergence `require` fail
    // the test if the shortcut ever regresses to linear rounds.
    // driverThreshold = 0 forces the DISTRIBUTED loop (the default would
    // route this tiny graph to the driver union-find, tested above).
    val edges = (0L until 999L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Dedup.connectedComponents(edges, maxIters = 12, driverThreshold = 0L)
      .as[(Long, Long)].collect()
    assert(got.length == 1000)
    assert(got.forall(_._2 == 0L))
  }

  test("cosine matches a reference computation") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val expected = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val got = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(VectorOps.cosine($"a", $"b")).as[Double].collect().head
    assert(math.abs(got - expected) < 1e-12)
  }
}
