package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the KLL/MRL quantile sketch contract: bounded rank error at lake-
  * realistic n, exact weight conservation under any partitioning (the
  * property q242 gates through the disk boundary), serialization
  * roundtrip, and loud failure on a k mismatch. */
class KllSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rankOf(sorted: Array[Double], v: Double): Double = {
    val i = java.util.Arrays.binarySearch(sorted, v)
    val pos = if (i >= 0) {
      var j = i
      while (j + 1 < sorted.length && sorted(j + 1) == v) j += 1
      j + 1
    } else -(i + 1)
    pos.toDouble / sorted.length
  }

  test("rank error stays within 1.5% at n=200k through a grouped pipeline") {
    // deterministic pseudo-uniform data via the codegen'd xxhash64
    val n = 200000
    val df = spark.range(n).select(
      (col("id") % 16).as("g"),
      (pmod(xxhash64(col("id")), lit(1000000L)).cast("double") / 1000.0)
        .as("v"))
    val sk = new KllSketchAggregator(256).toColumn.name("sk")
    val sketches = df.as[(Long, Double)].groupByKey(_._1).mapValues(_._2)
      .agg(sk).toDF("g", "sk")
    val qAgg = new KllQuantileAggregator(256, Seq(0.01, 0.25, 0.5, 0.9, 0.99))
      .toColumn.name("qs")
    val merged = sketches.select(lit(1).as("one"), col("sk"))
      .as[(Int, Array[Byte])].groupByKey(_._1).mapValues(_._2)
      .agg(qAgg).collect().head._2
    val sorted = df.select("v").as[Double].collect().sorted
    val targets = Seq(0.01, 0.25, 0.5, 0.9, 0.99)
    targets.zip(merged.take(5)).foreach { case (q, est) =>
      val r = rankOf(sorted, est)
      assert(math.abs(r - q) <= 0.015, s"q=$q est=$est rank=$r")
    }
    // total weight survives the group/merge tree exactly
    assert(merged.last.toLong == n)
  }

  test("partition layout cannot lose weight (merge conservation)") {
    val vals = (1 to 9999).map(_.toDouble) // odd count → odd-buffer merges
    for (parts <- Seq(1, 7, 32)) {
      val ds = spark.sparkContext.parallelize(vals, parts).toDS()
      val sk = new KllSketchAggregator(64).toColumn.name("sk")
      val bytes = ds.groupByKey(_ => 1).mapValues(identity).agg(sk)
        .collect().head._2
      val st = KllOps.deserialize(bytes)
      assert(KllOps.count(st) == vals.size.toLong, s"parts=$parts")
      val med = KllOps.quantile(st, 0.5)
      assert(math.abs(med - 5000.0) < 500.0, s"parts=$parts med=$med")
    }
  }

  test("serialization roundtrip is lossless") {
    var st = KllOps.empty(32)
    (1 to 1000).foreach(i => st = KllOps.update(st, i.toDouble))
    val back = KllOps.deserialize(KllOps.serialize(st))
    assert(back == st)
  }

  test("k mismatch fails loudly in the merge aggregators") {
    val sk64 = KllOps.serialize(KllOps.empty(64))
    val e = intercept[IllegalArgumentException](
      new KllMergeAggregator(256).reduce(KllOps.newBuf(256), sk64))
    assert(e.getMessage.contains("k mismatch"))
    val e2 = intercept[IllegalArgumentException](
      new KllQuantileAggregator(256, Seq(0.5)).reduce(KllOps.newBuf(256), sk64))
    assert(e2.getMessage.contains("k mismatch"))
  }

  test("quantile of an empty sketch refuses; singleton is exact") {
    intercept[IllegalArgumentException](KllOps.quantile(KllOps.empty(8), 0.5))
    val st = KllOps.update(KllOps.empty(8), 42.0)
    assert(KllOps.quantile(st, 0.0) == 42.0)
    assert(KllOps.quantile(st, 1.0) == 42.0)
  }
}
