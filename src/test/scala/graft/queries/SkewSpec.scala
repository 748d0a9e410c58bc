package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** AQE's runtime answer to skew (SURVEY.md §4 P11): a hot join key gets its
  * shuffle partition split at execution time, no salting required. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("AQE splits a hot-key partition in a sort-merge join and stays correct") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // hot key 7 carries 200k rows; 100k cold rows spread over keys 10-1008;
      // the right side covers every key once -> expected join size 300k
      val left = spark.range(200000).select(lit(7L).as("k"), col("id").as("v"))
        .union(spark.range(100000)
          .select((col("id") % 999 + 10).as("k"), col("id").as("v")))
      val right = spark.range(1200).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // execute THIS dataset (count() would build and finalize a different
      // AQE plan) and then read its final adaptive plan
      assert(joined.collect().length == 300000)
      val plan = joined.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should have marked the hot partition as skewed:\n$plan")
    } finally {
      saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
  }
}
