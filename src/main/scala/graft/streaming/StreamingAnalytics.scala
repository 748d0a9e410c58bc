package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * the watermark horizon — bounded state, unlike a global distinct. */
  def dedupWithinWatermark(
      events: DataFrame,
      keys: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

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
}
