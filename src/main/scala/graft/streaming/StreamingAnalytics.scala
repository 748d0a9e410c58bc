package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming analytic extensions over an event stream with an event-time
  * `ts` column (SURVEY.md §2.6 ST1/ST3/ST4 — capabilities the reference
  * leaves on the table; its only time-bucketing is the delivery buffer).
  *
  * State posture at scale: every operator here is keyed and watermarked, so
  * state size is bounded by (keys in watermark window), not stream length;
  * Spark evicts state as the watermark advances.
  */
object StreamingAnalytics {

  /** Tumbling event-time window counts with a watermark — append mode emits
    * a window exactly once, when the watermark passes its end (late rows
    * beyond the watermark are dropped, within it are merged). */
  def windowedCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup: drops re-deliveries of the same key seen within
    * the watermark horizon — bounded state, unlike a global distinct.
    *
    * One entry point for both modes: Spark rejects
    * `dropDuplicatesWithinWatermark` on batch frames outright, so the batch
    * path runs plain `dropDuplicates` — semantically what the streaming op
    * computes whenever re-deliveries arrive inside the horizon (the
    * watermark only bounds STATE, it never changes which rows survive).
    * The batch form is oracle-gated (q195); the streaming form's
    * state-eviction semantics are pinned by StreamingAnalyticsSpec. */
  def dedupWithinWatermark(
      events: DataFrame,
      keys: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
    else events.dropDuplicates(keys)

  /** Gap-based session windows per key (the streaming form of the batch
    * sessionization in q39): a session closes after `gap` of inactivity and
    * emits once the watermark passes its end. State per open session only.
    * All referenced columns are parameters so the operator applies to any
    * keyed event frame (user streams, device heartbeats, …). */
  def sessionCounts(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("sw"), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col(keyCol), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Stream-stream interval join: each purchase matched to the same user's
    * views in the preceding hour. Both sides are watermarked and the join
    * condition bounds the event-time distance, so Spark can evict buffered
    * rows once the watermark clears them — state stays proportional to one
    * hour of traffic, not the stream.
    *
    * The batch form of this is q57 (as-of) / q69 (range join); here the
    * interval predicate rides Spark's symmetric hash join with state
    * watermark eviction — the streaming-native plan for the same semantics.
    */
  def purchaseViewJoin(events: DataFrame,
      horizon: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    purchaseViewJoin(events, horizon, watermark, "inner")

  /** LEFT OUTER variant: every purchase emits, view columns NULL when no
    * same-user view preceded it within the horizon — the "unattributed
    * conversion" row an attribution pipeline needs. In streaming, the
    * null-padded row is held back until the watermark proves no matching
    * view can still arrive, then emitted exactly once (pinned by
    * StreamingAnalyticsSpec); state eviction is the same
    * interval-condition bound as the inner form. */
  def purchaseViewOuterJoin(events: DataFrame,
      horizon: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    purchaseViewJoin(events, horizon, watermark, "left_outer")

  private def purchaseViewJoin(events: DataFrame, horizon: String,
      watermark: String, joinType: String): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $horizon"), joinType)
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
        col("p_ts"), col("v_ts"))
  }

  /** One device's low-voltage run-length state (bounded: two numbers). */
  final case class VoltageState(consecutive: Int, lastEpoch: Long)
  /** Emitted when a device crosses `minConsecutive` low readings in a row. */
  final case class VoltageAlert(deviceid: Int, consecutive: Int, epoch: Long)

  /** Custom keyed state via flatMapGroupsWithState (ST4): alert when a
    * device reports `minConsecutive` consecutive sub-threshold battery
    * readings — the stateful escalation the reference's per-record voltage
    * check (hello.py:181-192) cannot express, because a record-at-a-time
    * transform has no memory between records.
    *
    * State is one (count, epoch) pair per device, evicted by EVENT-time
    * timeout `idleMs` past the watermark once a device stops reporting —
    * the 100 TB posture: state ∝ active devices, never events. (Event-time
    * timeout, not processing-time: wall-clock timeouts re-trigger empty
    * batches forever, which both breaks determinism and never lets
    * processAllAvailable settle.)
    *
    * Input columns: deviceid int, battery_voltage double, date_time long
    * (epoch seconds, assumed in-order per device within a batch). */
  def voltageRunAlerts(spark: SparkSession, heartbeats: DataFrame,
      threshold: Double = 4.0, minConsecutive: Int = 3,
      idleMs: Long = 3600L * 1000): Dataset[VoltageAlert] = {
    import spark.implicits._
    heartbeats
      .select(col("deviceid").cast("int"),
        col("battery_voltage").cast("double"),
        col("date_time").cast("long"),
        timestamp_seconds(col("date_time")).as("ts"))
      .withWatermark("ts", "1 hour")
      .as[(Int, Double, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (deviceid: Int, rows: Iterator[(Int, Double, Long, java.sql.Timestamp)],
         state: GroupState[VoltageState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(VoltageState(0, 0L))
            // fold the batch's readings through the run-length counter
            val out = scala.collection.mutable.ArrayBuffer.empty[VoltageAlert]
            rows.toSeq.sortBy(_._3).foreach { case (_, bv, epoch, _) =>
              st = if (bv < threshold) VoltageState(st.consecutive + 1, epoch)
                   else VoltageState(0, epoch)
              if (st.consecutive == minConsecutive)
                out += VoltageAlert(deviceid, st.consecutive, epoch)
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs, 0L) + idleMs)
            out.iterator
          }
        })
  }

  /** First occurrence of a key, with its earliest epoch in the batch. */
  final case class FirstSeen(key: String, firstEpoch: Long)

  /** Spark 4 `transformWithState` processor: emit each key the FIRST time
    * it is seen, suppress re-deliveries, and (optionally) let the per-key
    * marker expire via native state TTL — streaming exact-dedup with
    * bounded state, the arbitrary-state successor to
    * [[dedupWithinWatermark]] when the dedup horizon is wall-clock (ingest
    * re-delivery windows) rather than event-time. Requires the RocksDB
    * state store provider (the only backend implementing TTL'd column
    * families). */
  final class FirstSeenProcessor(ttl: Option[java.time.Duration])
      extends StatefulProcessor[String, (String, Long), FirstSeen] {
    @transient private var seen: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong,
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
    override def handleInputRows(key: String,
        rows: Iterator[(String, Long)],
        timers: TimerValues): Iterator[FirstSeen] =
      if (seen.exists()) Iterator.empty
      else {
        var minE = Long.MaxValue
        rows.foreach(r => if (r._2 < minE) minE = r._2)
        seen.update(minE)
        Iterator.single(FirstSeen(key, minE))
      }
  }

  /** Streaming first-seen dedup over (key, epoch) rows via
    * `transformWithState` — state is one long per live key. At 100 TB of
    * re-delivered ingest this is the idempotency filter: state ∝ distinct
    * keys (inside the TTL window when one is set), never stream length.
    *
    * TTL caveat: a TTL forces TimeMode.ProcessingTime, whose timer
    * machinery schedules micro-batches continuously — correct for an
    * always-on production stream, but the query then never terminates on
    * its own (neither processAllAvailable nor AvailableNow settles; >1200
    * empty batches observed). Default is no TTL (TimeMode.None), which
    * drains and settles like any stateful op; pass a TTL only for
    * deployments that stop queries explicitly. */
  def firstSeenDedup(spark: SparkSession, keyed: DataFrame,
      ttl: Option[java.time.Duration] = None): Dataset[FirstSeen] = {
    import spark.implicits._
    val timeMode =
      if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    keyed.select(col("key").cast("string"), col("epoch").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new FirstSeenProcessor(ttl),
        timeMode, OutputMode.Append())
  }

  /** One closed session per key: event count and [first, last] epoch-ms. */
  final case class SessionSummary(
      key: String, nEvents: Long, firstEpoch: Long, lastEpoch: Long)

  /** `transformWithState` with EVENT-TIME timers: gap-based sessionization.
    * Events accumulate in a ListState; each batch (re)registers one timer
    * at lastEpoch+gap; when the WATERMARK passes it, `handleExpiredTimer`
    * emits the closed session and clears the key's state. The timer-driven
    * variant of the q39 batch sessionizer and the session-window agg —
    * needed when the per-session output is a custom fold, not an agg.
    *
    * Event-time timers fire on watermark advance (no continuous batch
    * scheduling — unlike ProcessingTime mode, the query drains and
    * settles). State per key = its open-session events + one timer:
    * bounded by the gap horizon, the same eviction contract as
    * [[sessionCounts]]. */
  final class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, (String, Long), SessionSummary] {
    @transient private var events: ListState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      events = getHandle.getListState[Long]("events", Encoders.scalaLong,
        TTLConfig.NONE)
    override def handleInputRows(key: String,
        rows: Iterator[(String, Long)],
        timers: TimerValues): Iterator[SessionSummary] = {
      var maxE = Long.MinValue
      rows.foreach { r =>
        events.appendValue(r._2)
        if (r._2 > maxE) maxE = r._2
      }
      // one live timer per key: move the session close to lastEpoch+gap
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(maxE + gapMs)
      Iterator.empty
    }
    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionSummary] = {
      val es = events.get().toSeq
      events.clear()
      if (es.isEmpty) Iterator.empty
      else Iterator.single(SessionSummary(key, es.size.toLong, es.min, es.max))
    }
  }

  /** Gap-based streaming sessionization over (key, ts) rows — sessions
    * close `gap` after their last event, driven by event-time timers
    * against the stream's watermark. */
  def timerSessions(spark: SparkSession, keyed: DataFrame,
      gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "10 seconds"): Dataset[SessionSummary] = {
    import spark.implicits._
    keyed.select(col("key").cast("string"), col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .select(col("key"), (col("ts").cast("double") * 1000).cast("long").as("epoch"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Updated cumulative count for one (key, category) the batch touched. */
  final case class CategoryCount(key: String, category: String, n: Long)

  /** `transformWithState` with MAP state (the third state shape, after the
    * ValueState dedup and ListState sessions): per-key running counts by
    * category, emitting the new cumulative count for every (key, category)
    * a batch touches — the streaming form of a two-level groupBy where the
    * inner key set is open-ended. MapState stores one entry per live
    * (key, category), so a hot key with few categories costs a few longs,
    * and RocksDB point-updates exactly the touched entries — a ValueState
    * holding a whole Map would rewrite the full map per batch. */
  final class CategoryCountProcessor
      extends StatefulProcessor[String, (String, String), CategoryCount] {
    @transient private var counts: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String,
        rows: Iterator[(String, String)],
        timers: TimerValues): Iterator[CategoryCount] = {
      val delta = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      rows.foreach { case (_, cat) =>
        delta.update(cat, delta.getOrElse(cat, 0L) + 1L)
      }
      delta.iterator.map { case (cat, d) =>
        val n = (if (counts.containsKey(cat)) counts.getValue(cat) else 0L) + d
        counts.updateValue(cat, n)
        CategoryCount(key, cat, n)
      }
    }
  }

  /** Running per-(key, category) counts over (key, category) rows; each
    * micro-batch emits the updated totals for the pairs it touched. */
  def categoryCounts(spark: SparkSession,
      keyed: DataFrame): Dataset[CategoryCount] = {
    import spark.implicits._
    keyed.select(col("key").cast("string"), col("category").cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .transformWithState(new CategoryCountProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  final case class QuantileUpdate(key: String, n: Long, p50: Double,
      p90: Double)

  /** `transformWithState` with a SKETCH in state: per-key running
    * p50/p90 from a KLL quantile sketch ([[graft.functions.KllOps]],
    * q242's batch primitive) carried across micro-batches as its
    * serialized bytes in a ValueState. Each batch folds its rows into the
    * sketch and emits the updated estimates — the streaming latency
    * dashboard without retaining any raw values: state per key is the
    * ~4 KB sketch no matter how many events ever flowed. This is the
    * state shape unbounded-percentile streaming REQUIRES — exact
    * quantiles need the full history, which is exactly what streaming
    * state must never hold. */
  final class QuantileSketchProcessor(k: Int = 256)
      extends StatefulProcessor[String, (String, Double), QuantileUpdate] {
    @transient private var sk: ValueState[Array[Byte]] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sk = getHandle.getValueState[Array[Byte]]("kll",
        Encoders.BINARY, TTLConfig.NONE)
    override def handleInputRows(key: String,
        rows: Iterator[(String, Double)],
        timers: TimerValues): Iterator[QuantileUpdate] = {
      val buf =
        if (sk.exists()) graft.functions.KllOps.stateToBuf(
          graft.functions.KllOps.deserialize(sk.get()))
        else graft.functions.KllOps.newBuf(k)
      var touched = false
      rows.foreach { case (_, v) =>
        graft.functions.KllOps.updateBuf(buf, v); touched = true
      }
      if (!touched) Iterator.empty
      else {
        val st = graft.functions.KllOps.bufToState(buf)
        sk.update(graft.functions.KllOps.serialize(st))
        Iterator.single(QuantileUpdate(key,
          graft.functions.KllOps.count(st),
          graft.functions.KllOps.quantile(st, 0.5),
          graft.functions.KllOps.quantile(st, 0.9)))
      }
    }
  }

  /** Running per-key quantile estimates over (key, value) rows; each
    * micro-batch emits the updated p50/p90 for the keys it touched. */
  def quantileSketchStream(spark: SparkSession,
      keyed: DataFrame): Dataset[QuantileUpdate] = {
    import spark.implicits._
    keyed.select(col("key").cast("string"), col("value").cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .transformWithState(new QuantileSketchProcessor(),
        TimeMode.None(), OutputMode.Append())
  }
}
