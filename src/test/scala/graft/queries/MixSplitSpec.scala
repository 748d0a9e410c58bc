package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkTestSession}

/** Semantic pins for the corpus-mixing/splitting operators beyond the
  * driver's hash gate: q147's split must be leakage-free and exhaustive,
  * q148's temperature quotas must upweight small sources vs proportional
  * sampling and the hash-threshold selection must land near quota. */
class MixSplitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.01"

  test("q147: zero straddling groups, three splits partition the corpus") {
    val rows = SparkEntry.queries("q147_leakage_safe_split")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("train", "val", "test"))
    assert(rows.forall(_.getLong(3) == 0L),
      "content-group-keyed split can never straddle")
    // doubled corpus: every doc accounted for exactly once
    val nDocs = rows.map(_.getLong(2)).sum
    val corpus = 2L * graft.Tables.load(spark, sf, "documents").count()
    assert(nDocs == corpus, s"splits must partition the corpus: $nDocs/$corpus")
    // the hex thresholds target 75/12.5/12.5 — allow generous slack on a
    // finite corpus but pin the ordering
    val bySplit = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
  }

  test("q148: selection tracks quota; alpha=0.5 upweights small sources") {
    val rows = SparkEntry.queries("q148_temperature_mix")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for ((src, n, quota, sampled) <- rows) {
      assert(quota <= n, s"$src quota bounded by source size")
      // md5 uniformity: sampled/n tracks quota/n within 4 sigma of binomial
      val p = quota.toDouble / n
      val sd = math.sqrt(n * p * (1 - p))
      assert(math.abs(sampled - quota) <= 4 * sd + 1,
        s"$src sampled=$sampled quota=$quota n=$n")
    }
    // temperature effect: sampling RATE decreases with source size
    // (rate ∝ n^-0.5), so the largest source has the lowest rate
    val rates = rows.sortBy(_._2).map { case (_, n, q, _) => q.toDouble / n }
    assert(rates.zip(rates.tail).forall { case (small, large) => small >= large },
      s"rates must be non-increasing in source size: ${rates.mkString(", ")}")
  }
}
