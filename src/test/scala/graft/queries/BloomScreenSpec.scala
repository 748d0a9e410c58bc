package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graftx.BloomFilterFunctions
import graft.SparkTestSession

/** Pins the bloom membership screen's one-sided error contract against the
  * exact set on real corpus data: everything truly contaminated is flagged
  * (no false negatives — the property that makes the screen safe for
  * decontamination), and the false-positive overhead stays near the sized
  * rate. */
class BloomScreenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.01"

  def grams3(c: org.apache.spark.sql.Column) = {
    val w = split(c, " ")
    when(size(w) >= 3,
      array_distinct(transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1),
          element_at(w, i + 2))))).otherwise(array().cast("array<string>"))
  }

  test("bloom screen flags every exactly-contaminated doc; FP rate stays near the sized bound") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val sh = docs.select(col("doc_id"), grams3(col("text")).as("g")).cache()
    val bench = sh.filter(col("doc_id") % 100 === 0)
      .select(explode(col("g")).as("gram")).distinct().cache()
    val nBench = bench.count()
    val cand = sh.filter(col("doc_id") % 100 =!= 0)
      .select(col("doc_id"), explode(col("g")).as("gram"))

    val exact = cand.join(bench, Seq("gram"), "left_semi")
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet

    // sized at ~10 bits per item -> ~1% theoretical FP per probe
    val bloom = bench.agg(BloomFilterFunctions
        .bloomAgg(col("gram"), nBench, nBench * 10).as("bf"))
      .head().getAs[Array[Byte]](0)
    val flagged = cand
      .filter(BloomFilterFunctions.mightContain(bloom, col("gram")))
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet

    assert(exact.subsetOf(flagged),
      s"bloom must never miss a true hit; missed ${(exact -- flagged).take(5)}")
    val clean = sh.filter(col("doc_id") % 100 =!= 0).count() - exact.size
    val fp = (flagged -- exact).size.toDouble / math.max(clean, 1L)
    info(s"benchmark grams=$nBench, exact hits=${exact.size}, " +
      s"bloom flagged=${flagged.size}, doc-level FP rate=$fp")
    // per-doc FP compounds over its ~30 gram probes; 1% per probe keeps
    // the doc-level rate well under 30% — assert a generous ceiling that
    // still catches a mis-sized or broken filter (which flags ~100%)
    assert(fp <= 0.35, s"doc-level FP rate $fp")
  }
}
