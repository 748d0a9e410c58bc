package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.queries.DedupQueries

/** Exact characterization of the SemDeDup drop rule (q93): a vector is
  * dropped iff a same-cluster vector with a smaller id is within the cosine
  * threshold. The reference set is recomputed brute-force on the driver from
  * the collected vectors + assignments — independent of the per-cluster
  * join the query uses.
  */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("dropped == {vectors with a lower-id same-cluster neighbor >= thr}") {
    // The isotropic corpus has no natural near-dup pairs (same reason q44's
    // threshold has a verified margin), so inject exact copies under new
    // ids: a copy lands in its source's cluster (identical cosine to every
    // centroid) and must be dropped in its favor.
    val base = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val e = base.unionByName(
      base.filter(col("vec_id") % 7 === 0)
        .withColumn("vec_id", col("vec_id") + 10000))
    val thr = 0.8
    val flags = DedupQueries.semanticDedupFlags(e, k = 4, iters = 2, thr = thr)
      .select(col("vec_id"), col("cid"), col("dropped"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getBoolean(2))))
      .toMap

    val vecs = e.select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(flags.keySet == vecs.keySet, "every vector gets a flag")

    val expectedDropped = vecs.keySet.filter { id =>
      vecs.keySet.exists { other =>
        other < id && flags(other)._1 == flags(id)._1 &&
          cos(vecs(other), vecs(id)) >= thr
      }
    }
    val actualDropped = flags.collect { case (id, (_, true)) => id }.toSet
    assert(actualDropped == expectedDropped,
      s"drop sets differ: only-actual=${actualDropped -- expectedDropped} " +
        s"only-expected=${expectedDropped -- actualDropped}")
    assert(expectedDropped.nonEmpty,
      "threshold should produce at least one drop on the test corpus")
    assert(expectedDropped.size < vecs.size,
      "threshold must not drop everything")
  }
}
