package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series shaping over the event stream: resampling with gap fill and
  * cohort retention — the window/generator composites a metrics pipeline
  * runs hourly. Both deterministic (bucket values avoid order-dependent
  * picks) and oracle-checked.
  */
object TimeSeriesQueries {

  val defs: Seq[QueryDef] = Seq(

    // Resample to an hourly grid with forward fill: each user's sparse
    // events become a dense per-hour series between their first and last
    // hour; empty buckets carry the last observed value forward. The spine
    // is generated per key (sequence + explode — no driver loop), the fill
    // is one window pass. Bucket value = max(value): deterministic without
    // relying on intra-bucket ordering.
    QueryDef.sql(
      "q79_gap_fill",
      """WITH ev AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h, value
        |  FROM events WHERE user_id < 20),
        |b AS (SELECT user_id, h, count(*) AS n, max(value) AS v
        |      FROM ev GROUP BY user_id, h),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(min(h), max(h),
        |                         INTERVAL 1 HOUR)) AS h
        |  FROM ev GROUP BY user_id)
        |SELECT s.user_id, s.h AS bucket_ts,
        |       CAST(coalesce(b.n, 0) AS BIGINT) AS n_events,
        |       last_value(b.v IGNORE NULLS)
        |         OVER (PARTITION BY s.user_id ORDER BY s.h
        |               ROWS UNBOUNDED PRECEDING) AS filled_value
        |FROM spine s LEFT JOIN b ON b.user_id = s.user_id AND b.h = s.h
        |ORDER BY s.user_id, bucket_ts""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events").filter(col("user_id") < 20)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"),
          col("value"))
      val b = ev.groupBy("user_id", "h")
        .agg(count(lit(1)).as("n"), max("value").as("v"))
      val spine = ev.groupBy("user_id")
        .agg(min("h").as("h0"), max("h").as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR")))
            .as("h"))
      val w = Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(b, Seq("user_id", "h"), "left")
        .select(col("user_id"), col("h").as("bucket_ts"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          last(col("v"), ignoreNulls = true).over(w).as("filled_value"))
        .orderBy("user_id", "bucket_ts")
    },

    // Cohort retention: per day, active users split into new (first-ever
    // appearance) vs returning. Two aggregations — first-touch per user,
    // then per-day composition; the standard growth-analytics query.
    QueryDef.sql(
      "q80_retention",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, user_id FROM events GROUP BY 1, 2),
        |first_touch AS (
        |  SELECT user_id, min(d) AS d0 FROM daily GROUP BY user_id)
        |SELECT d.d AS day,
        |       count(*) AS active_users,
        |       count(CASE WHEN f.d0 = d.d THEN 1 END) AS new_users,
        |       count(CASE WHEN f.d0 < d.d THEN 1 END) AS returning_users
        |FROM daily d JOIN first_touch f ON f.user_id = d.user_id
        |GROUP BY d.d
        |ORDER BY day""".stripMargin) { (s, d) =>
      val daily = t(s, d, "events")
        .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      val firstTouch = daily.groupBy("user_id").agg(min("d").as("d0"))
      daily.join(firstTouch, Seq("user_id"))
        .groupBy(col("d").as("day"))
        .agg(count(lit(1)).as("active_users"),
          count(when(col("d0") === col("d"), 1)).as("new_users"),
          count(when(col("d0") < col("d"), 1)).as("returning_users"))
        .orderBy("day")
    },

    // SCD2 interval derivation (change-data-capture → slowly-changing
    // dimension): per user, collapse consecutive equal event_type rows,
    // then each change opens a validity interval [valid_from, valid_to)
    // closed by the next change (NULL = current). Two window passes over
    // the same (user_id, ts, event_id) ordering — one shuffle, both
    // windows reuse its partitioning. Timestamps compare exactly across
    // engines (both µs after ns truncation).
    QueryDef.sql(
      "q94_scd2",
      """WITH ordered AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events WHERE user_id < 25),
        |chg AS (
        |  SELECT user_id, event_type, ts, event_id FROM ordered
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_id, event_type, ts AS valid_from,
        |       lead(ts) OVER (PARTITION BY user_id
        |                      ORDER BY ts, event_id) AS valid_to,
        |       (lead(ts) OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) IS NULL) AS is_current
        |FROM chg
        |ORDER BY user_id, valid_from, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val chg = t(s, d, "events").filter(col("user_id") < 25)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev", lag("event_type", 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .drop("prev")
      chg.withColumn("valid_to", lead("ts", 1).over(w))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy("user_id", "valid_from", "event_id")
    }
  )
}
