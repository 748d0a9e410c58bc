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

  test("windowed aggregation state survives a checkpoint restart (ST5 for stateful ops)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-aggrestart").toString
    val source = MemoryStream[(Timestamp, String, Double)]
    def startQuery() = StreamingAnalytics.windowedCounts(
      source.toDF().toDF("ts", "event_type", "value"),
      windowLen = "1 hour", watermark = "2 hours")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/cp")
      .format("parquet").option("path", s"$dir/out").start()

    // run 1: one event lands in the (still open) 10:00 window, then stop
    val q1 = startQuery()
    source.addData((ts("2024-01-01 10:05:00"), "click", 1.0))
    q1.processAllAvailable(); q1.stop()

    // run 2 on the same checkpoint: a second event must MERGE into the
    // recovered 10:00 window state, then the watermark closes it
    val q2 = startQuery()
    source.addData((ts("2024-01-01 10:40:00"), "click", 2.0))
    q2.processAllAvailable()
    source.addData((ts("2024-01-01 15:00:00"), "view", 1.0))
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(s"$dir/out")
      .select("window_start", "event_type", "n", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(rows.contains((ts("2024-01-01 10:00:00"), "click", 2L, 3.0)),
      s"pre-restart event must still be in the window state, got $rows")
  }

  test("stream-stream interval join matches views within the hour before a purchase") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, Long, Long, String)]
    val joined = StreamingAnalytics.purchaseViewJoin(
      source.toDF().toDF("ts", "event_id", "user_id", "event_type"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()

    source.addData(
      (ts("2024-01-01 09:10:00"), 1L, 7L, "view"),   // in horizon
      (ts("2024-01-01 08:30:00"), 2L, 7L, "view"),   // too old (>1h before)
      (ts("2024-01-01 09:50:00"), 3L, 8L, "view"),   // other user
      (ts("2024-01-01 10:00:00"), 4L, 7L, "purchase"))
    q.processAllAvailable()
    // advance the watermark so buffered state flushes deterministically
    source.addData((ts("2024-01-01 15:00:00"), 9L, 1L, "view"))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("ssj_out").select("purchase_id", "view_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((4L, 1L)), s"only the in-horizon same-user view, got $pairs")
  }

  test("stream-stream LEFT OUTER interval join emits null-padded purchases after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, Long, Long, String)]
    val joined = StreamingAnalytics.purchaseViewOuterJoin(
      source.toDF().toDF("ts", "event_id", "user_id", "event_type"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssoj_out").start()

    source.addData(
      (ts("2024-01-01 09:10:00"), 1L, 7L, "view"),     // matches purchase 4
      (ts("2024-01-01 09:50:00"), 3L, 8L, "view"),     // other user
      (ts("2024-01-01 10:00:00"), 4L, 7L, "purchase"), // matched
      (ts("2024-01-01 10:00:00"), 5L, 9L, "purchase")) // no view -> null pad
    q.processAllAvailable()
    // the null-padded row must NOT emit while a matching view could still
    // arrive (watermark holds it back)
    val early = spark.table("ssoj_out")
      .select("purchase_id", "view_id").collect()
    assert(!early.exists(r => r.getLong(0) == 5L),
      s"unmatched purchase emitted before watermark closure: ${early.toSeq}")
    // advance the watermark past purchase-time + horizon so the outer row
    // flushes exactly once. Two subtleties this pins: the global watermark
    // is the MIN across both sides' watermark nodes (policy=min), so BOTH
    // the purchase and the view filter must see late events; and the
    // watermark updates at batch END, so the null-padded row emits in the
    // NEXT batch (hence two nudge batches). The nudge purchases themselves
    // stay buffered (the watermark never passes their time) — they must
    // not leak into the output.
    source.addData(
      (ts("2024-01-02 00:00:00"), 9L, 1L, "view"),
      (ts("2024-01-02 00:00:00"), 11L, 2L, "purchase"))
    q.processAllAvailable()
    source.addData(
      (ts("2024-01-02 00:10:00"), 10L, 1L, "view"),
      (ts("2024-01-02 00:10:00"), 12L, 2L, "purchase"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssoj_out")
      .select("purchase_id", "view_id")
      .as[(Long, Option[Long])].collect().toSet
    assert(rows == Set((4L, Some(1L)), (5L, None)),
      s"matched pair + exactly-once null pad, got $rows")
  }

  test("flatMapGroupsWithState alerts on N consecutive low-voltage heartbeats per device") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Int, Double, Long)]
    val alerts = StreamingAnalytics.voltageRunAlerts(spark,
      source.toDF().toDF("deviceid", "battery_voltage", "date_time"),
      threshold = 4.0, minConsecutive = 3)
    val q = alerts.writeStream.outputMode("append")
      .format("memory").queryName("va_out").start()

    // device 1: low, low, recover, low, low, low -> one alert at epoch 600
    // device 2: always healthy -> nothing
    source.addData(
      (1, 3.5, 100L), (1, 3.6, 200L), (1, 4.5, 300L),
      (1, 3.2, 400L), (1, 3.1, 500L), (1, 3.0, 600L),
      (2, 4.8, 100L), (2, 4.9, 200L), (2, 5.0, 300L))
    q.processAllAvailable()
    // run-length state must SPAN micro-batches: this low reading continues
    // the run (4 consecutive) rather than starting at 1 — and the alert
    // fires only on the exact threshold crossing, so no duplicate emits
    source.addData((1, 3.4, 700L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("va_out")
      .select("deviceid", "consecutive", "epoch")
      .as[(Int, Int, Long)].collect().toSet
    assert(got == Set((1, 3, 600L)),
      s"one alert at the third consecutive low, got $got")
  }

  test("transformWithState first-seen dedup emits each key once (RocksDB state)") {
    implicit val sqlCtx = spark.sqlContext
    // No TTL → TimeMode.None, so AvailableNow drains and terminates (a TTL
    // forces ProcessingTime mode whose timers schedule batches forever —
    // see the operator's scaladoc). Two AvailableNow runs against one
    // checkpoint also prove the state survives a restart.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val source = MemoryStream[(String, Long)]
      val dir = java.nio.file.Files.createTempDirectory("graft-tws")
      val out = dir.resolve("data").toString
      val ckpt = dir.resolve("ckpt").toString
      def runOnce(): Unit = {
        val q = StreamingAnalytics.firstSeenDedup(
            spark, source.toDF().toDF("key", "epoch"))
          .writeStream.outputMode("append").format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // run 1: A twice (min epoch must win), B once
      source.addData(("A", 105L), ("A", 100L), ("B", 200L))
      runOnce()
      // run 2 (restart from checkpoint): A re-delivered (suppressed), C new
      source.addData(("A", 300L), ("C", 400L))
      runOnce()
      val got = spark.read.parquet(out)
        .as[(String, Long)].collect().toSet
      assert(got == Set(("A", 100L), ("B", 200L), ("C", 400L)),
        s"each key exactly once with its first epoch, got $got")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState MapState keeps running per-(key, category) counts across restarts") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val source = MemoryStream[(String, String)]
      val dir = java.nio.file.Files.createTempDirectory("graft-tws-map")
      val out = dir.resolve("data").toString
      val ckpt = dir.resolve("ckpt").toString
      def runOnce(): Unit = {
        val q = StreamingAnalytics.categoryCounts(
            spark, source.toDF().toDF("key", "category"))
          .writeStream.outputMode("append").format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // run 1: u1 clicks twice + views once; u2 views once
      source.addData(("u1", "click"), ("u1", "view"), ("u1", "click"),
        ("u2", "view"))
      runOnce()
      // run 2 (restart from checkpoint): counts must CONTINUE, not reset —
      // u1 clicks again (2→3), u2 adds a first click (map gains an entry)
      source.addData(("u1", "click"), ("u2", "click"))
      runOnce()
      val got = spark.read.parquet(out)
        .as[(String, String, Long)].collect().toSet
      assert(got == Set(
        ("u1", "click", 2L), ("u1", "view", 1L), ("u2", "view", 1L),
        ("u1", "click", 3L), ("u2", "click", 1L)),
        s"per-batch emissions must carry cumulative totals, got $got")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState carries a KLL sketch in state: quantiles continue across restarts") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val source = MemoryStream[(String, Double)]
      val dir = java.nio.file.Files.createTempDirectory("graft-tws-kll")
      val out = dir.resolve("data").toString
      val ckpt = dir.resolve("ckpt").toString
      def runOnce(): Unit = {
        val q = StreamingAnalytics.quantileSketchStream(
            spark, source.toDF().toDF("key", "value"))
          .writeStream.outputMode("append").format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // run 1: values 1..100 for key A — p50 near 50
      source.addData((1 to 100).map(i => ("A", i.toDouble)): _*)
      runOnce()
      // run 2 (restart from checkpoint): 101..200 — the sketch must have
      // RETAINED run 1, so n=200 and the median moves to ~100, not ~150
      source.addData((101 to 200).map(i => ("A", i.toDouble)): _*)
      runOnce()
      val got = spark.read.parquet(out)
        .as[(String, Long, Double, Double)].collect()
        .map(r => (r._2, r._3, r._4)).sortBy(_._1)
      assert(got.map(_._1).toSeq == Seq(100L, 200L),
        s"counts must accumulate across the restart, got ${got.toSeq}")
      val (_, p50a, p90a) = got(0)
      val (_, p50b, p90b) = got(1)
      assert(math.abs(p50a - 50) <= 5 && math.abs(p90a - 90) <= 5,
        s"run-1 estimates off: $p50a / $p90a")
      assert(math.abs(p50b - 100) <= 8 && math.abs(p90b - 180) <= 10,
        s"run-2 estimates must cover BOTH runs (state retained): $p50b / $p90b")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState event-time timers close sessions at gap past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val source = MemoryStream[(String, Timestamp)]
      val sessions = StreamingAnalytics.timerSessions(
        spark, source.toDF().toDF("key", "ts"),
        gapMs = 60 * 1000L, watermark = "0 seconds")
      val q = sessions.writeStream.outputMode("append")
        .format("memory").queryName("sess_out").start()

      // u1: two events 30 s apart (one session); u2: one event
      source.addData(("u1", ts("2024-01-01 10:00:00")),
        ("u1", ts("2024-01-01 10:00:30")), ("u2", ts("2024-01-01 10:00:10")))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0,
        "sessions still open: watermark has not passed lastEpoch+gap")

      // sentinel far ahead pushes the watermark past both timers
      source.addData(("wm", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("sess_out")
        .as[(String, Long, Long, Long)].collect().toSet
      def ms(s: String) = ts(s).getTime
      assert(got == Set(
        ("u1", 2L, ms("2024-01-01 10:00:00"), ms("2024-01-01 10:00:30")),
        ("u2", 1L, ms("2024-01-01 10:00:10"), ms("2024-01-01 10:00:10"))),
        s"both sessions must close once the watermark passes, got $got")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
