package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.ingest.GeoDim

/** Companion buffer for the notifier under test: publish runs executor-side,
  * which in local mode is the same JVM — a static synchronized buffer
  * observes exactly what a real transport would have been handed. */
object AlertNotifierSpec {
  val published = java.util.Collections.synchronizedList(
    new java.util.ArrayList[(Long, Int, String)]())

  class Recording extends StreamingIngest.AlertNotifier {
    def publish(alert: org.apache.spark.sql.Row): Unit =
      published.add((alert.getAs[Long]("batch_id"),
        alert.getAs[Int]("deviceid"), alert.getAs[String]("alert_type")))
  }
}

/** S14 push delivery: the alerts sink's foreachBatch notifier hook
  * (hello.py:181-192's sketched SNS publish) with its AT-LEAST-ONCE
  * contract — a replayed batch re-publishes while the batchId-keyed table
  * write stays idempotent. */
class AlertNotifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import AlertNotifierSpec._

  def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  /** SOH envelope with battery voltage below the 4 V alert threshold. */
  def lowBattery(deviceId: Int, epoch: Long): (String, String) = {
    val inner =
      s"""{"ln":-122.4,"lt":37.7,"si":0.4,"bi":-0.1,"sv":13.8,"bv":3.2,"d":$epoch,"n":1,"a":1.0,"s":0.1,"c":1.0,"r":-91,"ti":0.1}"""
    val header =
      s"""{"packetId":1,"deviceType":1,"deviceId":$deviceId,"userApplicationId":1,"organizationId":1,"len":1,"status":0,"hiveRxTime":"x","data":"${b64(inner)}"}"""
    (s"r-$deviceId-$epoch", b64(header))
  }

  /** Healthy twin: both voltages above threshold — must NOT publish. */
  def healthy(deviceId: Int, epoch: Long): (String, String) = {
    val inner =
      s"""{"ln":-122.4,"lt":37.7,"si":0.4,"bi":-0.1,"sv":13.8,"bv":4.1,"d":$epoch,"n":1,"a":1.0,"s":0.1,"c":1.0,"r":-91,"ti":0.1}"""
    val header =
      s"""{"packetId":1,"deviceType":1,"deviceId":$deviceId,"userApplicationId":1,"organizationId":1,"len":1,"status":0,"hiveRxTime":"x","data":"${b64(inner)}"}"""
    (s"r-$deviceId-$epoch", b64(header))
  }

  test("alerts push to the notifier per batch; replay re-publishes (at-least-once), table stays idempotent") {
    published.clear()
    val root = Files.createTempDirectory("graft-alert-push").toString
    val paths = StreamingIngest.Paths(root)
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, String)]
    source.addData(lowBattery(7, 1678759166L), healthy(8, 1678759166L))
    val q = StreamingIngest.start(spark,
      source.toDF().toDF("recordId", "data"), GeoDim.empty(spark), paths,
      Trigger.AvailableNow(), notifier = Some(new Recording))
    q.processAllAvailable(); q.stop()

    // exactly the alerting device published, with its type; the healthy
    // twin stays silent
    val first = published.toArray.toSeq
    assert(first == Seq((0L, 7, "low_battery_voltage")),
      s"expected one low-battery publish from batch 0, got $first")

    // crash-replay of the SAME micro-batch (foreachBatch re-invocation with
    // the same batchId): publishes again — at-least-once delivery — while
    // the batchId-keyed dynamic overwrite leaves the table with ONE row
    val classified = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(lowBattery(7, 1678759166L)._1,
          lowBattery(7, 1678759166L)._2),
        org.apache.spark.sql.Row(healthy(8, 1678759166L)._1,
          healthy(8, 1678759166L)._2)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("recordId",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("data",
          org.apache.spark.sql.types.StringType))))
    StreamingIngest.writeBatch(classified, GeoDim.empty(spark), paths,
      batchId = 0L, notifier = Some(new Recording))
    val second = published.toArray.toSeq
    assert(second == Seq((0L, 7, "low_battery_voltage"),
      (0L, 7, "low_battery_voltage")),
      s"replay must re-publish (at-least-once): $second")
    val landed = spark.read.parquet(paths.alerts)
    assert(landed.count() == 1,
      "the batchId-keyed alerts table must hold ONE row after replay")
    assert(landed.select("deviceid").head().getInt(0) == 7)
  }
}
