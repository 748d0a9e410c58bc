package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graftx.GraftExtensions
import graft.SparkTestSession

/** The native expressions must be reachable from plain SQL once the
  * extension is registered. */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("cosine_similarity and sorted_intersect_count callable from SQL") {
    GraftExtensions.register(spark)
    val cos = spark.sql(
      "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))," +
        " array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))")
      .collect().head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-15)
    val n = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 5L), array(2L, 3L, 5L, 9L))")
      .collect().head.getLong(0)
    assert(n == 2)
    val ip = spark.sql(
      "SELECT inner_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))")
      .collect().head.getDouble(0)
    assert(ip == 11.0)
    val sq = spark.sql(
      "SELECT squared_distance(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(4.0 AS FLOAT), CAST(6.0 AS FLOAT)))")
      .collect().head.getDouble(0)
    assert(sq == 25.0)
    val jw = spark.sql("SELECT jaro_winkler('martha', 'marhta')")
      .collect().head.getDouble(0)
    assert(math.abs(jw - 0.9611111111111111) < 1e-12)
  }
}
