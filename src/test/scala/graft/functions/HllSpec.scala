package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the HllAggregator's sketch contract: accuracy within the p=12
  * theoretical band, and — the property that makes it a lake primitive —
  * MERGE INVARIANCE: the same data through any partitioning (i.e. any
  * partial-aggregation tree) yields the identical estimate. */
class HllSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def estimate(n: Long, partitions: Int): Long = {
    val agg = new HllAggregator().toColumn.name("est")
    spark.range(n).repartition(partitions)
      .select(xxhash64(col("id")).as("h")).as[Long]
      .select(agg).head()
  }

  test("estimates stay within 3x the theoretical standard error") {
    // 1.04/sqrt(4096) ~ 1.6%; allow 5%
    for (n <- Seq(100L, 5000L, 100000L)) {
      val est = estimate(n, 8)
      assert(math.abs(est - n).toDouble / n < 0.05, s"n=$n est=$est")
    }
  }

  test("partition layout cannot change the estimate (merge associativity)") {
    val by = Seq(1, 8, 32).map(p => estimate(50000L, p))
    assert(by.distinct.size == 1, s"partitioning changed the sketch: $by")
  }

  test("empty input estimates zero; single value estimates one") {
    assert(estimate(0L, 1) == 0L)
    assert(estimate(1L, 1) == 1L)
  }

  test("grouped sketches merge like groupBy partials") {
    // distinct users per type, against exact
    val df = spark.range(20000)
      .select((col("id") % 3).cast("string").as("t"),
        (col("id") % 1777).as("u"))
    val agg = new HllAggregator().toColumn.name("est")
    val est = df.select(col("t"), xxhash64(col("u")).as("h"))
      .as[(String, Long)].groupByKey(_._1).mapValues(_._2)
      .agg(agg).collect().toMap
    val exact = df.groupBy("t").agg(countDistinct("u").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (t, n) =>
      assert(math.abs(est(t) - n).toDouble / n < 0.05, s"$t: $n vs ${est(t)}")
    }
  }

  test("precision mismatch fails loudly instead of truncating or crashing") {
    // merging sketches of different register counts is a precision-mix
    // bug upstream; the old element-wise-max either threw AIOOBE (shorter
    // right side) or silently truncated (longer right side)
    val p12 = new Array[Byte](1 << 12)
    val p10 = new Array[Byte](1 << 10)
    val e1 = intercept[IllegalArgumentException](HllOps.merge(p12, p10))
    assert(e1.getMessage.contains("precision mismatch"))
    val e2 = intercept[IllegalArgumentException](HllOps.merge(p10, p12))
    assert(e2.getMessage.contains("precision mismatch"))
    // and through the persisted-sketch path: reduce validates against p
    val e3 = intercept[Exception](
      new HllMergeAggregator(12).reduce(new Array[Byte](1 << 12), p10))
    assert(String.valueOf(e3.getMessage).contains("registers"))
  }
}
