package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Watermark semantics: windows emit exactly once in append mode; in-horizon
  * duplicates drop. */
class StreamingAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermarked tumbling window emits a window once its end passes the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamingAnalytics.windowedCounts(
      source.toDF().toDF("ts", "event_type", "value"),
      windowLen = "1 hour", watermark = "2 hours")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wc_out").start()

    // two events in the 10:00 window
    source.addData((ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:40:00"), "click", 2.0))
    q.processAllAvailable()
    assert(spark.table("wc_out").count() == 0, "window still open: nothing emitted")

    // an event far ahead pushes the watermark past 11:00
    source.addData((ts("2024-01-01 14:00:00"), "view", 1.0))
    q.processAllAvailable()
    source.addData((ts("2024-01-01 18:00:00"), "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wc_out")
      .select("window_start", "event_type", "n", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(rows.contains((ts("2024-01-01 10:00:00"), "click", 2L, 3.0)),
      s"10:00 click window must have merged both events, got $rows")
  }

  test("dropDuplicatesWithinWatermark removes in-horizon re-deliveries") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, Long, String)]
    val dedup = StreamingAnalytics.dedupWithinWatermark(
      source.toDF().toDF("ts", "event_id", "payload"),
      keys = Seq("event_id"), watermark = "1 hour")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dd_out").start()

    source.addData(
      (ts("2024-01-01 10:00:00"), 1L, "a"),
      (ts("2024-01-01 10:00:30"), 1L, "a-redelivered"),
      (ts("2024-01-01 10:01:00"), 2L, "b"))
    q.processAllAvailable()
    source.addData((ts("2024-01-01 10:02:00"), 1L, "a-again"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dd_out").select("event_id")
      .as[Long].collect().toSeq
    assert(ids.sorted == Seq(1L, 2L), s"each key once, got $ids")
  }
}
