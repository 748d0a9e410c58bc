package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Pins the [[graft.queries.globalRanks]] decomposition against the
  * single-partition `row_number()` it replaces — including the null-bucket
  * case a plain equi-join on the bucket key would silently drop (review
  * finding, round 6): null keys never match `===`, so rows whose bucket
  * expression evaluates to null would vanish from the ranked output while
  * the oracle ranks them NULLS FIRST. */
class RanksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("globalRanks keeps null-bucket rows and matches the global row_number") {
    import spark.implicits._
    // keys with nulls interleaved; bucket = floor(k/10) is null exactly
    // where k is null, so the null partition is exercised end-to-end
    val ks: Seq[java.lang.Long] =
      Seq[java.lang.Long](null, 7L, 93L, null, 41L, 12L, 55L, 3L, 88L, 21L)
    val df = ks.zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "id")
    val got = globalRanks(df,
        floor(col("k") / 10).cast("long"), Seq(col("k"), col("id")))
      .select("k", "id", "gid", "total")
    assert(got.count() == ks.size.toLong,
      "no row may be dropped — null buckets must survive the offsets join")
    // oracle: the single-partition form (fine on 10 rows); Spark's asc sort
    // is NULLS FIRST, matching globalRanks' null-bucket placement
    val oracle = df.withColumn("gid",
        row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
      .select("k", "id", "gid").collect()
      .map(r => (Option(r.get(0)), r.getLong(1)) -> r.getLong(2)).toMap
    got.collect().foreach { r =>
      val key = (Option(r.get(0)), r.getLong(1))
      assert(r.getLong(2) == oracle(key), s"gid mismatch for $key")
      assert(r.getLong(3) == ks.size.toLong, "total = corpus row count")
    }
  }

  test("ntileFromRank reproduces SQL ntile sizing, including total < k") {
    import spark.implicits._
    for ((n, k) <- Seq((10, 4), (7, 3), (2, 5), (32, 32))) {
      val df = (1L to n.toLong).toDF("id")
      // bucket must be monotone non-decreasing in the leading sort key —
      // that's globalRanks' contract (boundaries respect the total order)
      val got = globalRanks(df, floor(col("id") / 4).cast("long"), Seq(col("id")))
        .withColumn("b", ntileFromRank(k))
        .select("id", "b")
      val oracle = df.withColumn("b",
          ntile(k).over(Window.orderBy("id")).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got.collect().foreach { r =>
        assert(r.getLong(1) == oracle(r.getLong(0)),
          s"ntile($k) of ${r.getLong(0)} over $n rows")
      }
    }
  }
}
