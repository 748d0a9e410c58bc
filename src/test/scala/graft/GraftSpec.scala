package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSpec extends AnyFunSuite {
  test("configure() makes an arbitrary session engine-ready") {
    val spark = Graft.configure(SparkTestSession.spark)
    assert(spark.conf.get("spark.sql.chunkBase64String.enabled") == "false")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    // native expressions reachable from SQL after configure
    val n = spark.sql("SELECT sorted_intersect_count(array(1L,2L), array(2L,3L))")
      .collect().head.getLong(0)
    assert(n == 1)
    // the whole query surface runs on a configured session
    assert(SparkEntry.queries("q24_base64")(spark, "/root/testdata/sf0.001")
      .count() > 0)
  }
}
