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

  test("q148: selection tracks quota on the gated corpus") {
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
  }

  test("temperature quotas upweight small sources and respect the UniMax cap") {
    // The gated corpus's sources are all EQUAL-sized (rate ordering there
    // is vacuous), so the alpha=0.5 math is pinned on a skewed profile:
    // 10000/2500/100 with budget 0.5*12600 = 6300 and denom 100+50+10.
    // Uncapped, the 100-doc source's share would be 6300*10/160 = 393 >
    // 100 — the UniMax cap must clamp it to a full take — while mid
    // (6300*50/160 = 1968 of 2500) stays under its cap.
    import spark.implicits._
    val counts = Seq(("big", 10000L), ("mid", 2500L), ("small", 100L))
      .toDF("source", "n_docs")
    val q = TrainingPrepQueries.temperatureQuotas(counts, budgetFrac = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    for ((src, (n, quota, thr)) <- q) {
      assert(quota <= n, s"$src quota $quota exceeds source size $n")
      assert(thr.length == 4 && thr.matches("[0-9a-f]{4}"), s"$src thr $thr")
    }
    val rate = q.map { case (s2, (n, k, _)) => s2 -> k.toDouble / n }
    assert(rate("small") == 1.0, s"capped small source is a full take: $rate")
    assert(rate("small") > rate("mid") && rate("mid") > rate("big"),
      s"alpha=0.5 rate must strictly decrease with source size: $rate")
    // proportional sampling would give every source rate 0.5: the
    // temperature mix must sit above that for small, below for big
    assert(rate("big") < 0.5 && rate("mid") > 0.5, s"vs proportional: $rate")
  }

  test("curriculum schedule on a skewed corpus: balanced tiers, ordered scores, exact pacing") {
    // The gated corpus has equal-sized sources; the quintile math is
    // pinned on a skewed one — 203 docs vs 10 — where naive per-source
    // ntile edge cases (total % 5 != 0, total > 5 but barely) live.
    import spark.implicits._
    val sc = ((1 to 203).map(i => (i.toLong, "big", (10 + i % 7).toLong,
        (i % 101).toDouble / 101)) ++
      (1 to 10).map(i => (1000L + i, "tiny", 5L, i.toDouble / 11)))
      .toDF("doc_id", "source", "n_tokens", "score")
    val rows = TrainingPrepQueries.curriculumSchedule(sc).collect()
    for (src <- Seq("big", "tiny")) {
      val r = rows.filter(_.getString(0) == src).sortBy(_.getLong(1))
      assert(r.map(_.getLong(1)).toSeq == (1L to 5L), s"$src has 5 phases")
      val sizes = r.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1, s"$src tiers balanced: ${sizes.toSeq}")
      val avgs = r.map(_.getDouble(7))
      assert(avgs.zip(avgs.tail).forall { case (a, b) => a >= b },
        s"$src avg score non-increasing over phases: ${avgs.toSeq}")
      // pacing rows recompute from the tier masses
      assert(r.map(_.getLong(2)).scanLeft(0L)(_ + _).tail.toSeq ==
        r.map(_.getLong(4)).toSeq, s"$src cum_docs")
      assert(r.map(_.getLong(3)).scanLeft(0L)(_ + _).tail.toSeq ==
        r.map(_.getLong(5)).toSeq, s"$src cum_tokens")
      assert(r.last.getDouble(6) == 1.0, s"$src final frac_docs is 1")
    }
    // the schedule must agree with the naive per-source ntile it replaces
    import org.apache.spark.sql.functions.{col, ntile}
    val naive = sc.withColumn("phase",
        ntile(5).over(org.apache.spark.sql.expressions.Window
          .partitionBy("source")
          .orderBy(col("score").desc, col("doc_id"))))
      .groupBy("source", "phase").count()
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val naiveMap = naive.map { case (s2, p, n) => (s2, p.toLong) -> n }.toMap
    rows.foreach { r =>
      assert(naiveMap((r.getString(0), r.getLong(1))) == r.getLong(2),
        s"tier sizes must match naive ntile: $r")
    }
  }
}
