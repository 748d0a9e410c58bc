package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series shaping over the event stream: resampling with gap fill and
  * cohort retention — the window/generator composites a metrics pipeline
  * runs hourly. Both deterministic (bucket values avoid order-dependent
  * picks) and oracle-checked.
  */
object TimeSeriesQueries {

  def defs: Seq[QueryDef] = baseDefs ++ ewmaDefs ++ profileDefs

  private val baseDefs: Seq[QueryDef] = Seq(

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
    },

    // Rolling z-score anomaly detection: each (event_type, day)'s mean value
    // scored against the trailing 7 days' pooled mean/stddev. Cross-engine
    // float determinism comes from the StatsQueries discipline extended to
    // WINDOW frames: the rolling Σx / Σx² / n are EXACT decimal window sums
    // (inputs have 2 decimal digits, so DECIMAL(18,6) is exact and the sums
    // are order-independent), and only the final scalar formula — identical
    // IEEE ops on identical inputs — runs in double. 100 TB shape: one
    // shuffle on event_type; the day pre-aggregation and both window passes
    // reuse it.
    QueryDef.sql(
      "q105_anomaly",
      """WITH day_agg AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         count(*) AS n,
        |         sum(CAST(value AS DECIMAL(18,6))) AS s,
        |         sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS s2
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |roll AS (
        |  SELECT event_type, day, n,
        |         CAST(s AS DOUBLE) / n AS day_avg,
        |         CAST(sum(n)  OVER w AS DOUBLE) AS tn,
        |         CAST(sum(s)  OVER w AS DOUBLE) AS ts_,
        |         CAST(sum(s2) OVER w AS DOUBLE) AS ts2
        |  FROM day_agg
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, CAST(n AS BIGINT) AS n,
        |       round(day_avg, 6) AS day_avg,
        |       CASE WHEN tn >= 2 AND (ts2 - ts_ * ts_ / tn) / (tn - 1) > 0
        |            THEN round((day_avg - ts_ / tn) /
        |                       sqrt((ts2 - ts_ * ts_ / tn) / (tn - 1)), 4)
        |            END AS z,
        |       CAST(CASE WHEN tn >= 2 AND (ts2 - ts_ * ts_ / tn) / (tn - 1) > 0
        |                  AND abs((day_avg - ts_ / tn) /
        |                          sqrt((ts2 - ts_ * ts_ / tn) / (tn - 1))) > 2
        |            THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM roll
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v6 = col("value").cast(DecimalType(18, 6))
      val dayAgg = t(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), sum(v6).as("s"), sum(v6 * v6).as("s2"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-7, -1)
      val roll = dayAgg.select(col("event_type"), col("day"), col("n"),
        (col("s").cast("double") / col("n")).as("day_avg"),
        sum("n").over(w).cast("double").as("tn"),
        sum("s").over(w).cast("double").as("ts_"),
        sum("s2").over(w).cast("double").as("ts2"))
      val variance = (col("ts2") - col("ts_") * col("ts_") / col("tn")) /
        (col("tn") - 1)
      val zExpr = (col("day_avg") - col("ts_") / col("tn")) / sqrt(variance)
      val valid = col("tn") >= 2 && variance > 0
      roll.select(col("event_type"), col("day"), col("n"),
          round(col("day_avg"), 6).as("day_avg"),
          when(valid, round(zExpr, 4)).as("z"),
          when(valid && abs(zExpr) > 2, 1L).otherwise(0L).as("is_anomaly"))
        .orderBy("event_type", "day")
    },

    // Union-of-intervals coverage per user: each event opens a 5-minute
    // activity interval; overlapping intervals merge, and the output is
    // each user's merged-segment count and total covered time — the
    // interval-algebra sweep (sensor uptime, session coverage) that naive
    // DISTINCT-on-seconds would explode. One shuffle (by user), two window
    // passes, exact microsecond integers end to end. Segment boundaries:
    // an interval starts a new segment iff it begins strictly after the
    // running max end of all earlier intervals (ties on (st, en) are
    // whole-row duplicates, so per-user aggregates are order-insensitive).
    QueryDef.sql(
      "q123_interval_coverage",
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS st,
        |                   epoch_us(ts) + 300000000 AS en
        |            FROM events),
        |  m AS (SELECT user_id, st, en,
        |               max(en) OVER (PARTITION BY user_id ORDER BY st, en
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |                 AS prev_max
        |        FROM iv),
        |  g AS (SELECT user_id, st, en,
        |               sum(CASE WHEN prev_max IS NULL OR st > prev_max
        |                        THEN 1 ELSE 0 END)
        |                 OVER (PARTITION BY user_id ORDER BY st, en
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |                 AS seg
        |        FROM m),
        |  segs AS (SELECT user_id, seg, max(en) - min(st) AS cov
        |           FROM g GROUP BY user_id, seg)
        |SELECT user_id, count(*) AS n_segments,
        |       CAST(sum(cov) AS BIGINT) AS coverage_us
        |FROM segs GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val iv = t(s, d, "events").select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("st"))
        .withColumn("en", col("st") + 300000000L)
      val order = Window.partitionBy("user_id").orderBy("st", "en")
      val prevMax = max(col("en"))
        .over(order.rowsBetween(Window.unboundedPreceding, -1))
      val seg = sum(
        when(prevMax.isNull || col("st") > prevMax, 1).otherwise(0))
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      iv.withColumn("seg", seg)
        .groupBy("user_id", "seg")
        .agg((max(col("en")) - min(col("st"))).as("cov"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_segments"),
          sum(col("cov")).as("coverage_us"))
        .orderBy("user_id")
    },

    // Engagement metrics: daily actives + rolling-7-day distinct actives.
    // A rolling DISTINCT count cannot use a running-sum window (users
    // repeat across days), so each (user, day) activity row fans out to
    // the ≤7 window ends it contributes to — a BOUNDED explode (the
    // standard scale-safe rewrite) — and each window end counts distinct
    // users with partial aggregation. Epoch-day ints only.
    QueryDef.sql(
      "q139_rolling_actives",
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        |  FROM events),
        |mx AS (SELECT max(day) AS mxday FROM act),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau
        |        FROM act GROUP BY day),
        |rolled AS (
        |  SELECT act.day + i AS day, user_id
        |  FROM act, unnest(generate_series(0, 6)) AS t(i)),
        |r7 AS (SELECT day, count(DISTINCT user_id) AS rolling7
        |       FROM rolled GROUP BY day)
        |SELECT r.day, CAST(coalesce(d.dau, 0) AS BIGINT) AS dau,
        |       CAST(r.rolling7 AS BIGINT) AS rolling7
        |FROM r7 r LEFT JOIN dau d USING (day) CROSS JOIN mx
        |WHERE r.day <= mx.mxday
        |ORDER BY r.day""".stripMargin) { (s, d) =>
      val act = t(s, d, "events")
        .select(col("user_id"),
          floor(col("ts").cast("long") / 86400).cast("long").as("day"))
        .distinct()
      val dau = act.groupBy("day").agg(countDistinct("user_id").as("dau"))
      val r7 = act
        .select(col("user_id"),
          explode(sequence(col("day"), col("day") + 6)).as("day"))
        .groupBy("day").agg(countDistinct("user_id").as("rolling7"))
      val mx = act.agg(max("day").as("mxday"))
      // LEFT join from the rolling side: a day with no same-day activity
      // but a live trailing window must still report (dau = 0) — an inner
      // join would silently drop gap days from the series. The fan-out
      // past the last observed day is cut by the mxday bound.
      r7.join(dau, Seq("day"), "left")
        .crossJoin(broadcast(mx))
        .filter(col("day") <= col("mxday"))
        .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
          col("rolling7"))
        .orderBy("day")
    },

    // Hourly OHLC downsampling of the sensor value stream — the standard
    // telemetry compaction (first/last by event time + extremes per
    // bucket). Open/close pick EXISTING rows via a total (ts, event_id)
    // order, so every output double is a raw stored value — no float
    // arithmetic at all. One window + one aggregate per device-hour.
    QueryDef.sql(
      "q140_ohlc_bars",
      """WITH ticks AS (
        |  SELECT user_id AS device_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour,
        |         ts, event_id, value
        |  FROM events),
        |ordered AS (
        |  SELECT device_id, hour, value,
        |         row_number() OVER (PARTITION BY device_id, hour
        |                            ORDER BY ts, event_id) AS ra,
        |         row_number() OVER (PARTITION BY device_id, hour
        |                            ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM ticks)
        |SELECT device_id, hour,
        |       max(CASE WHEN ra = 1 THEN value END) AS open,
        |       max(value) AS high,
        |       min(value) AS low,
        |       max(CASE WHEN rd = 1 THEN value END) AS close,
        |       CAST(count(*) AS BIGINT) AS n_ticks
        |FROM ordered
        |GROUP BY device_id, hour
        |ORDER BY device_id, hour""".stripMargin) { (s, d) =>
      val ticks = t(s, d, "events")
        .select(col("user_id").as("device_id"),
          floor(col("ts").cast("long") / 3600).cast("long").as("hour"),
          col("ts"), col("event_id"), col("value"))
      val wa = Window.partitionBy("device_id", "hour").orderBy(col("ts"), col("event_id"))
      val wd = Window.partitionBy("device_id", "hour")
        .orderBy(col("ts").desc, col("event_id").desc)
      ticks
        .withColumn("ra", row_number().over(wa))
        .withColumn("rd", row_number().over(wd))
        .groupBy("device_id", "hour")
        .agg(max(when(col("ra") === 1, col("value"))).as("open"),
          max("value").as("high"),
          min("value").as("low"),
          max(when(col("rd") === 1, col("value"))).as("close"),
          count(lit(1)).as("n_ticks"))
        .orderBy("device_id", "hour")
    },

    // Time-weighted average value per device (TWAP): each sample holds
    // until the next one, so its weight is the gap to the successor (lead
    // window; the final sample carries no duration). Weights are exact
    // epoch-second ints; the weighted sum is the one float reduction,
    // rounded 4dp (q87's discipline).
    QueryDef.sql(
      "q141_twap",
      """WITH samples AS (
        |  SELECT user_id AS device_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |         event_id, value
        |  FROM events),
        |spans AS (
        |  SELECT device_id, value,
        |         lead(es) OVER (PARTITION BY device_id
        |                        ORDER BY es, event_id) - es AS dt
        |  FROM samples)
        |SELECT device_id,
        |       CAST(sum(dt) AS BIGINT) AS span_seconds,
        |       round(sum(value * dt) / sum(dt), 4) AS twap
        |FROM spans
        |WHERE dt IS NOT NULL AND dt > 0
        |GROUP BY device_id
        |ORDER BY device_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("device_id").orderBy("es", "event_id")
      t(s, d, "events")
        .select(col("user_id").as("device_id"),
          col("ts").cast("long").as("es"), col("event_id"), col("value"))
        .withColumn("dt", lead("es", 1).over(w) - col("es"))
        .filter(col("dt").isNotNull && col("dt") > 0)
        .groupBy("device_id")
        .agg(sum("dt").as("span_seconds"),
          round(sum(col("value") * col("dt")) / sum("dt"), 4).as("twap"))
        .orderBy("device_id")
    },

    // NEAREST-neighbor as-of matching with tolerance — pandas
    // merge_asof(direction='nearest'): each purchase pairs with the same
    // user's closest view within ±15 minutes, either direction, ties to
    // the EARLIER view. Composed from TWO AsOfJoin.joinPrior passes (the
    // backward pass as-is; the forward pass on the NEGATED time axis,
    // where "latest prior of −t" is "earliest next of t"), then a row-
    // local argmin — still one shuffle per pass, zero row explosion.
    // Equal-timestamp ties resolve to the smallest event_id in both
    // engines (tiebreak = −event_id: joinPrior keeps the largest
    // tiebreak, the oracle orders event_id ASC).
    QueryDef.sql(
      "q238_asof_nearest",
      """WITH p AS (SELECT user_id, ts, event_id FROM events
        |           WHERE event_type = 'purchase'),
        |     m AS (SELECT p.event_id, p.ts AS pts, near.vts
        |           FROM p LEFT JOIN LATERAL (
        |             SELECT v.ts AS vts FROM events v
        |             WHERE v.user_id = p.user_id AND v.event_type = 'view'
        |               AND abs(epoch_us(v.ts) - epoch_us(p.ts)) <= 900000000
        |             ORDER BY abs(epoch_us(v.ts) - epoch_us(p.ts)),
        |                      v.ts, v.event_id
        |             LIMIT 1) near ON TRUE)
        |SELECT CAST(count(*) AS BIGINT) AS n_purchases,
        |       CAST(count(vts) AS BIGINT) AS n_matched,
        |       CAST(count(CASE WHEN vts < pts THEN 1 END) AS BIGINT)
        |         AS n_backward,
        |       CAST(count(CASE WHEN vts > pts THEN 1 END) AS BIGINT)
        |         AS n_forward,
        |       CAST(coalesce(sum(abs(epoch_us(vts) - epoch_us(pts))), 0)
        |            AS BIGINT) AS sum_abs_us
        |FROM m""".stripMargin) { (s, d) =>
      val tolUs = 900000000L // 15 min
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("pus"),
          col("event_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("vus"),
          col("event_id").as("vid"))
      // backward: latest view at or before the purchase
      val back = AsOfJoin.joinPrior(
        purchases, views.select(col("user_id"), col("vus"),
          col("vus").as("bts"), (-col("vid")).as("tb")),
        "user_id", "pus", "vus", col("tb"))
        .select(col("event_id"), col("pus"), col("prior_bts").as("b_us"))
      // forward: earliest view at or after, via the negated axis
      val fwd = AsOfJoin.joinPrior(
        purchases.withColumn("npus", -col("pus")),
        views.select(col("user_id"), (-col("vus")).as("nvus"),
          col("vus").as("fts"), (-col("vid")).as("tb")),
        "user_id", "npus", "nvus", col("tb"))
        .select(col("event_id").as("f_eid"), col("prior_fts").as("f_us"))
      val joined = back.join(fwd, col("event_id") === col("f_eid"))
      val bd = abs(col("b_us") - col("pus"))
      val fd = abs(col("f_us") - col("pus"))
      val bOk = col("b_us").isNotNull && bd <= tolUs
      val fOk = col("f_us").isNotNull && fd <= tolUs
      val pick = when(bOk && (!fOk || bd <= fd), col("b_us"))
        .when(fOk, col("f_us"))
      joined.select(col("pus"), pick.as("v_us"))
        .agg(count(lit(1)).as("n_purchases"),
          count(col("v_us")).as("n_matched"),
          count(when(col("v_us") < col("pus"), 1)).as("n_backward"),
          count(when(col("v_us") > col("pus"), 1)).as("n_forward"),
          coalesce(sum(abs(col("v_us") - col("pus"))), lit(0L))
            .as("sum_abs_us"))
    },

    // CUSUM change-point detection: per event type, the cumulative sum of
    // daily-mean deviations from the type's overall mean — where |CUSUM|
    // peaks is the most likely level shift. Day means and type means come
    // from exact decimal sums; the running sum is an ORDERED window over
    // ~30 day rows per type (sequential accumulation in the same order in
    // both engines → identical doubles), and the argmax breaks ties by
    // earliest day.
    QueryDef.sql(
      "q234_cusum",
      """WITH dm AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                   CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
        |                     / count(*) AS day_mean
        |            FROM events GROUP BY 1, 2),
        |     tm AS (SELECT event_type,
        |                   CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
        |                     / count(*) AS type_mean
        |            FROM events GROUP BY 1),
        |     cs AS (SELECT d.event_type, d.day,
        |                   sum(d.day_mean - t.type_mean) OVER (
        |                     PARTITION BY d.event_type ORDER BY d.day
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |                     AS cusum
        |            FROM dm d JOIN tm t ON d.event_type = t.event_type),
        |     r AS (SELECT event_type, day, cusum,
        |                  row_number() OVER (PARTITION BY event_type
        |                    ORDER BY abs(cusum) DESC, day) AS rn,
        |                  count(*) OVER (PARTITION BY event_type) AS n_days
        |           FROM cs)
        |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
        |       day AS change_day, round(abs(cusum), 6) AS max_abs_cusum
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val dec = col("value").cast(org.apache.spark.sql.types.DecimalType(28, 6))
      val dm = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((sum(dec).cast("double") / count(lit(1))).as("day_mean"))
      val tm = ev.groupBy("event_type")
        .agg((sum(dec).cast("double") / count(lit(1))).as("type_mean"))
      val wCum = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cs = dm.join(broadcast(tm), "event_type")
        .withColumn("cusum",
          sum(col("day_mean") - col("type_mean")).over(wCum))
      val wR = Window.partitionBy("event_type")
        .orderBy(abs(col("cusum")).desc, col("day"))
      cs.withColumn("rn", row_number().over(wR))
        .withColumn("n_days",
          count(lit(1)).over(Window.partitionBy("event_type")))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("n_days"), col("day").as("change_day"),
          round(abs(col("cusum")), 6).as("max_abs_cusum"))
        .orderBy("event_type")
    },

    // Exponential smoothing (EWMA level) per event type, closed form: the
    // recursion l_t = α·x_t + (1−α)·l_{t−1} unrolls to a weighted sum
    // α·Σ (1−α)^(T−t)·x_t + (1−α)^T·x_0 — which IS expressible as one
    // grouped aggregate over (day index, day mean), no sequential state.
    // Day indices are exact integers from the prefix-free day grid; each
    // pow() term is rounded at 10 dp BEFORE summing (the q143 discipline:
    // JVM and libm pow may differ in the last ulp) so the fold is
    // order-independent at the retained precision.
    QueryDef.sql(
      "q236_exp_smoothing",
      """WITH dm AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                   CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
        |                     / count(*) AS x
        |            FROM events GROUP BY 1, 2),
        |     idx AS (SELECT event_type, day, x,
        |                    CAST(row_number() OVER (PARTITION BY event_type
        |                      ORDER BY day) AS BIGINT) - 1 AS t,
        |                    CAST(count(*) OVER (PARTITION BY event_type)
        |                         AS BIGINT) - 1 AS tmax
        |             FROM dm)
        |SELECT event_type, CAST(tmax + 1 AS BIGINT) AS n_days,
        |       round(sum(round(CASE WHEN t = 0
        |                  THEN pow(0.7, CAST(tmax AS DOUBLE)) * x
        |                  ELSE 0.3 * pow(0.7, CAST(tmax - t AS DOUBLE)) * x
        |                  END, 10)), 6) AS ewma_level
        |FROM idx GROUP BY event_type, tmax
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val dec = col("value").cast(org.apache.spark.sql.types.DecimalType(28, 6))
      val dm = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((sum(dec).cast("double") / count(lit(1))).as("x"))
      val wT = Window.partitionBy("event_type").orderBy("day")
      val idx = dm
        .withColumn("t", row_number().over(wT).cast("long") - 1)
        .withColumn("tmax",
          count(lit(1)).over(Window.partitionBy("event_type")).cast("long") - 1)
      idx.groupBy("event_type", "tmax")
        .agg(round(sum(round(
          when(col("t") === 0,
            pow(lit(0.7), col("tmax").cast("double")) * col("x"))
            .otherwise(lit(0.3) *
              pow(lit(0.7), (col("tmax") - col("t")).cast("double")) * col("x")),
          10)), 6).as("ewma_level"))
        .select(col("event_type"), (col("tmax") + 1).as("n_days"),
          col("ewma_level"))
        .orderBy("event_type")
    },

    // DAU/MAU stickiness: daily actives over trailing-28-day actives — the
    // engagement ratio product teams track. Both distinct counts run over
    // the (day, user) reduction (bounded at days × users), the trailing
    // window is a bounded day-grid range join (30×28 rows, broadcast), and
    // the ratio is one rounded division per day row.
    QueryDef.sql(
      "q240_dau_mau",
      """WITH du AS (SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |                            user_id
        |            FROM events),
        |     days AS (SELECT DISTINCT day FROM du),
        |     dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
        |     mau AS (SELECT d.day, count(DISTINCT u.user_id) AS mau
        |             FROM days d JOIN du u
        |               ON u.day BETWEEN d.day - 27 AND d.day
        |             GROUP BY d.day)
        |SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau,
        |       CAST(mau.mau AS BIGINT) AS mau,
        |       round(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
        |FROM dau JOIN mau ON dau.day = mau.day
        |ORDER BY dau.day""".stripMargin) { (s, d) =>
      val du = t(s, d, "events")
        .select((unix_seconds(col("ts")) / 86400).cast("long").as("day"),
          col("user_id")).distinct()
      val days = du.select("day").distinct()
      val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
      val mau = days.join(du.select(col("day").as("uday"), col("user_id")),
          col("uday").between(col("day") - 27, col("day")))
        .groupBy("day").agg(countDistinct("user_id").as("mau"))
      dau.join(mau, "day")
        .select(col("day"), col("dau"), col("mau"),
          round(col("dau").cast("double") / col("mau"), 6).as("stickiness"))
        .orderBy("day")
    },

    // Day-of-week seasonality profile: mean value per (type, weekday) —
    // the weekly-rhythm baseline behind anomaly thresholds. Means are
    // exact decimal sums over counts; weekday numbering normalized to
    // DuckDB's dow (0 = Sunday) from Spark's dayofweek (1 = Sunday).
    QueryDef.sql(
      "q235_dow_seasonality",
      """SELECT event_type,
        |       CAST(date_part('dow', ts) AS BIGINT) AS dow,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
        |             / count(*), 6) AS mean_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY event_type, dow""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"),
          (dayofweek(col("ts")) - 1).cast("long").as("dow"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")
            .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
            .cast("double") / count(lit(1)), 6).as("mean_value"))
        .orderBy("event_type", "dow")
    },

    // Point-in-time join against the SCD2 dimension: every purchase looks
    // up the state (last non-purchase event-type run, q94's change-capture)
    // that was VALID AT ITS TIMESTAMP — the lookup that makes slowly-
    // changing dimensions usable from fact tables, and the classic
    // leakage-safe feature join (a naive join to the CURRENT dimension row
    // leaks the future). Rides AsOfJoin.joinPrior (q57/q133's operator):
    // one shuffle on user_id, zero row explosion however many state
    // changes precede a purchase. Ties (state change at the purchase
    // instant) count as prior — pinned in both engines (side ordering
    // there, d.ts <= p.ts + DESC LIMIT 1 here).
    QueryDef.sql(
      "q201_pit_scd2",
      """WITH dim AS (
        |  SELECT user_id, ts, event_id, event_type AS state
        |  FROM (SELECT user_id, ts, event_id, event_type,
        |               lag(event_type) OVER (PARTITION BY user_id
        |                                     ORDER BY ts, event_id) AS prev
        |        FROM events WHERE event_type <> 'purchase')
        |  WHERE prev IS NULL OR prev <> event_type),
        |p AS (SELECT pu.value, s.state
        |      FROM (SELECT user_id, ts, value FROM events
        |            WHERE event_type = 'purchase') pu
        |      LEFT JOIN LATERAL (
        |        SELECT d.state FROM dim d
        |        WHERE d.user_id = pu.user_id AND d.ts <= pu.ts
        |        ORDER BY d.ts DESC, d.event_id DESC LIMIT 1) s ON TRUE)
        |SELECT coalesce(state, 'none') AS state,
        |       CAST(count(*) AS BIGINT) AS n_purchases,
        |       round(sum(value), 6) AS revenue
        |FROM p GROUP BY 1 ORDER BY state""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val dim = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("state"))
        .withColumn("prev", lag("state", 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("state"))
        .drop("prev")
      val facts = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      AsOfJoin.joinPrior(facts, dim, "user_id", "ts", "ts", col("event_id"))
        .groupBy(coalesce(col("prior_state"), lit("none")).as("state"))
        .agg(count(lit(1)).as("n_purchases"),
          round(sum("value"), 6).as("revenue"))
        .orderBy("state")
    },

    // Brown's double exponential smoothing (level + TREND — the term
    // q236's single smoothing lacks) per event type, in closed
    // convolution form: with zero initial state, S1_t = α·Σ(1-α)^j·y_{t-j}
    // and S2_t = α²·Σ(j+1)(1-α)^j·y_{t-j}, so level = 2S1−S2, trend =
    // α/(1-α)·(S1−S2), forecast = level + trend — the whole recursion
    // collapses to ONE weighted aggregate over the daily series at the
    // anchor day (no sequential scan, no UDF state). At 100 TB the shape
    // is: daily pre-aggregate (partial+final), broadcast of the 5-row
    // per-type anchor frame, one more partial+final aggregate — weights
    // decay geometrically so days beyond ~60 contribute < 1e-10 and the
    // 10 dp per-term rounding (q143's transcendental discipline: pow may
    // differ in the last ulp between libm and the JVM) zeroes them
    // identically in both engines.
    QueryDef.sql(
      "q243_holt_trend",
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |              AS BIGINT) AS day,
        |         CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS y
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT event_type, max(day) AS tmax FROM daily GROUP BY 1),
        |sm AS (
        |  SELECT d.event_type,
        |         sum(round(0.3 * power(0.7, m.tmax - d.day) * y, 10)) AS s1,
        |         sum(round(0.09 * (m.tmax - d.day + 1)
        |                   * power(0.7, m.tmax - d.day) * y, 10)) AS s2
        |  FROM daily d JOIN mx m ON d.event_type = m.event_type
        |  GROUP BY d.event_type)
        |SELECT event_type,
        |       round(2 * s1 - s2, 6) AS level,
        |       round((0.3 / 0.7) * (s1 - s2), 6) AS trend,
        |       round(2 * s1 - s2 + (0.3 / 0.7) * (s1 - s2), 6) AS forecast_next
        |FROM sm ORDER BY event_type""".stripMargin) { (s, d) =>
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("day"))
        .agg(msum(col("value"), 6).as("y"))
      val mx = daily.groupBy("event_type").agg(max("day").as("tmax"))
      val k = (col("tmax") - col("day")).cast("double")
      val sm = daily.join(broadcast(mx), "event_type")
        .groupBy("event_type")
        .agg(
          sum(round(lit(0.3) * pow(lit(0.7), k) * col("y"), 10)).as("s1"),
          sum(round(lit(0.09) * (k + 1) * pow(lit(0.7), k) * col("y"), 10))
            .as("s2"))
      sm.select(col("event_type"),
          round(lit(2) * col("s1") - col("s2"), 6).as("level"),
          round(lit(0.3 / 0.7) * (col("s1") - col("s2")), 6).as("trend"),
          round(lit(2) * col("s1") - col("s2")
            + lit(0.3 / 0.7) * (col("s1") - col("s2")), 6).as("forecast_next"))
        .orderBy("event_type")
    },

    // 7-day ROLLING quantiles from merged daily KLL sketches — q230's
    // sketch-window architecture (merge dailies instead of rescanning the
    // window) applied to percentiles, which only became possible once
    // q242 made the quantile sketch a mergeable value: the raw rows are
    // reduced once to 30 daily ~4 KB sketches, and each day's trailing
    // window re-merges ≤ 7 sketches — at 100 TB the rolling-latency
    // dashboard costs kilobytes per window, not a 7-day rescan. Bound
    // oracle (q242's pattern): exact windowed quantile_cont values + a
    // flag pinning each estimate's exact rank within ±5% of target. The
    // exact side IS the gate-scale audit (it rescans the window by
    // construction); the sketch path is the product.
    QueryDef.sql(
      "q268_rolling_quantiles",
      """WITH days AS (SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400
        |                     AS day FROM events),
        |w AS (
        |  SELECT d.day, e.value
        |  FROM days d JOIN events e
        |    ON CAST(floor(epoch(e.ts)) AS BIGINT) // 86400 BETWEEN d.day - 6 AND d.day)
        |SELECT day, CAST(count(*) AS BIGINT) AS n,
        |       round(quantile_cont(value, 0.5), 6) AS p50,
        |       round(quantile_cont(value, 0.9), 6) AS p90,
        |       TRUE AS rank_ok
        |FROM w GROUP BY day ORDER BY day""".stripMargin) { (s, d) =>
      import s.implicits._
      val ev = t(s, d, "events")
        .select((unix_seconds(col("ts")) / 86400).cast("long").as("day"),
          col("value"))
      val days = ev.select("day").distinct()
      val win = ev.as("e")
        .join(broadcast(days.select(col("day").as("wday"))),
          col("e.day") >= col("wday") - 6 && col("e.day") <= col("wday"))
        .select(col("wday"), col("value"))
        .localCheckpoint(true) // exact audit AND the rank check read it
      val exact = win.groupBy("wday")
        .agg(count(lit(1)).as("n"),
          expr("percentile(value, 0.5)").as("x50"),
          expr("percentile(value, 0.9)").as("x90"))
      // the product path: daily sketches, rolling re-merge per window
      val skAgg = new graft.functions.KllSketchAggregator(256).toColumn.name("sk")
      val dailySk = ev.as[(Long, Double)].groupByKey(_._1).mapValues(_._2)
        .agg(skAgg).toDF("day", "sk")
      val qAgg = new graft.functions.KllQuantileAggregator(256, Seq(0.5, 0.9))
        .toColumn.name("qs")
      val est = dailySk
        .join(broadcast(days.select(col("day").as("wday"))),
          col("day") >= col("wday") - 6 && col("day") <= col("wday"))
        .select(col("wday"), col("sk"))
        .as[(Long, Array[Byte])].groupByKey(_._1).mapValues(_._2)
        .agg(qAgg).toDF("wday", "qs")
        .select(col("wday"), element_at(col("qs"), 1).as("e50"),
          element_at(col("qs"), 2).as("e90"))
      val ranks = win.join(broadcast(est), "wday")
        .groupBy("wday")
        .agg((sum(when(col("value") <= col("e50"), 1L).otherwise(0L)) /
          count(lit(1))).as("r50"),
          (sum(when(col("value") <= col("e90"), 1L).otherwise(0L)) /
            count(lit(1))).as("r90"))
      exact.join(ranks, "wday")
        .select(col("wday").as("day"), col("n"),
          round(col("x50"), 6).as("p50"), round(col("x90"), 6).as("p90"),
          (abs(col("r50") - 0.5) <= 0.05 && abs(col("r90") - 0.9) <= 0.05)
            .as("rank_ok"))
        .orderBy("day")
    },

    // Calendar gap-fill with LINEAR interpolation — the time-series
    // scaffold step (downsample → dense grid → fill) every forecasting
    // pipeline runs before a model sees the series: a synthetic outage
    // (every 5th day dropped) punches holes in the daily revenue series,
    // the full type×day grid left-joins the observations, and missing
    // cells interpolate between the nearest observations on each side
    // (edges carry the nearest single neighbor). The carry columns are
    // last/first(IGNORE NULLS) over mirrored ordered windows partitioned
    // by type — two window passes, no self-join against the timeline.
    QueryDef.sql(
      "q269_gap_fill",
      """WITH daily0 AS (
        |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |         round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
        |           AS rev
        |  FROM events WHERE event_type IN ('purchase', 'signup')
        |  GROUP BY 1, 2),
        |daily AS (SELECT * FROM daily0 WHERE day % 5 <> 2),
        |grid AS (
        |  SELECT t.event_type, d.day
        |  FROM (SELECT DISTINCT event_type FROM daily0) t
        |  CROSS JOIN (SELECT unnest(generate_series(
        |       (SELECT min(day) FROM daily0),
        |       (SELECT max(day) FROM daily0))) AS day) d),
        |j AS (
        |  SELECT g.event_type, g.day, daily.rev,
        |         last_value(daily.rev IGNORE NULLS) OVER wp AS prev_rev,
        |         last_value(CASE WHEN daily.rev IS NOT NULL THEN g.day END
        |                    IGNORE NULLS) OVER wp AS prev_day,
        |         first_value(daily.rev IGNORE NULLS) OVER wn AS next_rev,
        |         first_value(CASE WHEN daily.rev IS NOT NULL THEN g.day END
        |                     IGNORE NULLS) OVER wn AS next_day
        |  FROM grid g LEFT JOIN daily
        |    ON g.event_type = daily.event_type AND g.day = daily.day
        |  WINDOW wp AS (PARTITION BY g.event_type ORDER BY g.day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (PARTITION BY g.event_type ORDER BY g.day
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |       CASE WHEN rev IS NOT NULL THEN 'observed'
        |            WHEN prev_rev IS NULL OR next_rev IS NULL THEN 'edge'
        |            ELSE 'interpolated' END AS fill,
        |       round(CASE WHEN rev IS NOT NULL THEN rev
        |            WHEN prev_rev IS NULL THEN next_rev
        |            WHEN next_rev IS NULL THEN prev_rev
        |            ELSE prev_rev + (next_rev - prev_rev) * (day - prev_day)
        |                 / (next_day - prev_day) END, 6) AS rev_filled
        |FROM j ORDER BY event_type, day""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily0 = t(s, d, "events")
        .filter(col("event_type").isin("purchase", "signup"))
        .groupBy(col("event_type"),
          (unix_seconds(col("ts")) / 86400).cast("long").as("day"))
        // exact-decimal sum (msum): a plain double sum is partition-order
        // dependent and a last-ulp wobble can flip the 6 dp rounding
        // boundary between engines — the q243/q271 discipline.
        .agg(r6(msum(col("value"), 6)).as("rev"))
        .localCheckpoint(true) // grid bounds, type list, and observations
      val daily = daily0.filter(col("day") % 5 =!= 2)
      val mm = daily0.agg(min("day").as("d0"), max("day").as("d1"))
      val grid = daily0.select("event_type").distinct()
        .crossJoin(broadcast(mm))
        .select(col("event_type"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val wp = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val j = grid.join(daily, Seq("event_type", "day"), "left")
        .withColumn("prev_rev", last(col("rev"), ignoreNulls = true).over(wp))
        .withColumn("prev_day",
          last(when(col("rev").isNotNull, col("day")), ignoreNulls = true)
            .over(wp))
        .withColumn("next_rev", first(col("rev"), ignoreNulls = true).over(wn))
        .withColumn("next_day",
          first(when(col("rev").isNotNull, col("day")), ignoreNulls = true)
            .over(wn))
      j.select(col("event_type"), col("day"),
          when(col("rev").isNotNull, "observed")
            .when(col("prev_rev").isNull || col("next_rev").isNull, "edge")
            .otherwise("interpolated").as("fill"),
          round(when(col("rev").isNotNull, col("rev"))
            .when(col("prev_rev").isNull, col("next_rev"))
            .when(col("next_rev").isNull, col("prev_rev"))
            .otherwise(col("prev_rev") +
              (col("next_rev") - col("prev_rev")) *
                (col("day") - col("prev_day")) /
                (col("next_day") - col("prev_day"))), 6).as("rev_filled"))
        .orderBy("event_type", "day")
    },

    // Lag-k autocorrelation (ACF at lags 1–3) of the daily revenue series
    // per type — the seasonality/momentum diagnostic read before any
    // forecasting model choice (q243's smoothing, q235's weekday
    // profile). Numerics follow the q224/q194 exact-sufficient-statistic
    // discipline: daily revenue quantizes to exact integer micro-units in
    // DECIMAL(38,0), the five power sums accumulate exactly (products
    // ≈ 1.3e19 ≪ 1e38), and the Pearson formula runs once on doubles
    // derived from identical integers — order-independent,
    // partial-aggregation-safe, hash-stable at 6 dp.
    QueryDef.sql(
      "q271_autocorrelation",
      """WITH daily AS (
        |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |         CAST(round(sum(CAST(value AS DECIMAL(28,6))) * 1000000, 0)
        |              AS DECIMAL(38,0)) AS y
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT d.event_type, k.k, d.y AS yt,
        |         lag(d.y, k.k) OVER (PARTITION BY d.event_type, k.k
        |                             ORDER BY d.day) AS yk
        |  FROM daily d CROSS JOIN (SELECT unnest([1, 2, 3]) AS k) k),
        |st AS (
        |  SELECT event_type, k,
        |         CAST(count(*) AS DOUBLE) AS n,
        |         CAST(sum(yt) AS DOUBLE) AS sx, CAST(sum(yk) AS DOUBLE) AS sy,
        |         CAST(sum(yt * yk) AS DOUBLE) AS sxy,
        |         CAST(sum(yt * yt) AS DOUBLE) AS sxx,
        |         CAST(sum(yk * yk) AS DOUBLE) AS syy
        |  FROM lagged WHERE yk IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
        |       round((n * sxy - sx * sy)
        |             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
        |         AS acf
        |FROM st ORDER BY event_type, k""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          (unix_seconds(col("ts")) / 86400).cast("long").as("day"))
        .agg(round(sum(col("value").cast(DecimalType(28, 6))) * 1000000, 0)
          .cast(DecimalType(38, 0)).as("y"))
        .localCheckpoint(true) // three lag frames read it
      // Spark's lag() offset is a literal — unroll the three lags and
      // union (the oracle's column-offset lag, spelled per k)
      val lagged = (1 to 3).map { k =>
        val w = Window.partitionBy("event_type").orderBy("day")
        daily.select(col("event_type"), lit(k).as("k"), col("y").as("yt"),
          lag("y", k).over(w).as("yk"))
      }.reduce(_ unionByName _)
      val st = lagged.filter(col("yk").isNotNull)
        .groupBy("event_type", "k")
        .agg(count(lit(1)).cast("double").as("n"),
          sum("yt").cast("double").as("sx"), sum("yk").cast("double").as("sy"),
          sum(col("yt") * col("yk")).cast("double").as("sxy"),
          sum(col("yt") * col("yt")).cast("double").as("sxx"),
          sum(col("yk") * col("yk")).cast("double").as("syy"))
      st.select(col("event_type"), col("k").cast("long").as("k"),
          col("n").cast("long").as("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("acf"))
        .orderBy("event_type", "k")
    },

    // Classical seasonal-trend decomposition (STL's moving-average core)
    // of the per-type daily revenue series: trend = 7-day centered moving
    // average, seasonal = day-of-week mean of the detrended series,
    // residual = the anomaly signal a monitoring pipeline alerts on.
    // Complements q271 (ACF detects the period; this one removes it).
    // Determinism: daily revenue and the trend window numerator are exact
    // DECIMAL sums (the window sum of decimals is exact; the double cast
    // and /count happen in the identical tree both engines); day-of-week
    // is only a GROUPING key, so Spark/DuckDB dow-numbering conventions
    // need not match — membership (day mod 7) does, and seasonal rounds
    // at 10 dp before the residual subtraction. Scale shape: the rollup
    // is map-side combined; every window/group after it runs on the
    // ≤|types|·|days| frame, partitioned by type.
    QueryDef.sql(
      "q289_stl_decompose",
      """WITH dr AS (SELECT event_type,
        |                   CAST(date_trunc('day', ts) AS DATE) AS day,
        |                   sum(CAST(value AS DECIMAL(28,6))) AS rev
        |            FROM events GROUP BY 1, 2),
        |     tr AS (SELECT event_type, day, CAST(rev AS DOUBLE) AS rev,
        |                   CAST(sum(rev) OVER w AS DOUBLE)
        |                     / count(*) OVER w AS trend
        |            FROM dr
        |            WINDOW w AS (PARTITION BY event_type ORDER BY day
        |                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |     de AS (SELECT event_type, day, rev, trend, rev - trend AS detr,
        |                   dayofweek(day) AS dow
        |            FROM tr),
        |     se AS (SELECT event_type, dow, round(avg(detr), 10) AS seasonal
        |            FROM de GROUP BY 1, 2)
        |SELECT d.event_type, d.day, round(d.rev, 6) AS rev,
        |       round(d.trend, 6) AS trend,
        |       round(s.seasonal, 6) AS seasonal,
        |       round(d.detr - s.seasonal, 6) AS resid
        |FROM de d JOIN se s USING (event_type, dow)
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val dec = org.apache.spark.sql.types.DecimalType(28, 6)
      val dr = t(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast(dec)).as("rev"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-3, 3)
      val de = dr
        .select(col("event_type"), col("day"),
          col("rev").cast("double").as("rev"),
          (sum("rev").over(w).cast("double")
            / count(lit(1)).over(w)).as("trend"))
        .withColumn("detr", col("rev") - col("trend"))
        .withColumn("dow", dayofweek(col("day")))
      val se = de.groupBy("event_type", "dow")
        .agg(round(avg("detr"), 10).as("seasonal"))
      de.join(broadcast(se), Seq("event_type", "dow"))
        .select(col("event_type"), col("day"), r6(col("rev")).as("rev"),
          r6(col("trend")).as("trend"), r6(col("seasonal")).as("seasonal"),
          r6(col("detr") - col("seasonal")).as("resid"))
        .orderBy("event_type", "day")
    },

    // Theil–Sen robust trend per event type — the median of all pairwise
    // daily-revenue slopes, the estimator that survives the outlier days
    // an OLS fit (q224) gets dragged by (breakdown point 29 %). The pair
    // world is DAY pairs, not row pairs: |days|² is bounded by the time
    // span and independent of corpus size, so the per-type ranking
    // window sorts a span-bounded frame, never the fact table. Daily
    // values are exact BIGINT cents; each slope is ONE double division
    // of exact integers (identical operand tree in both engines), the
    // median is an exact order statistic under the total (slope, da, db)
    // order, and the even-count midpoint averages exactly two doubles —
    // commutative, so partition order can't move it.
    QueryDef.sql(
      "q300_theil_sen",
      """WITH dr AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                   CAST(sum(CAST(round(value * 100) AS BIGINT))
        |                        AS BIGINT) AS v
        |            FROM events GROUP BY event_type, day),
        |b AS (SELECT min(day) AS d0 FROM dr),
        |di AS (SELECT event_type, date_diff('day', d0, day) AS d, v
        |       FROM dr, b),
        |pr AS (SELECT a.event_type,
        |              CAST(b2.v - a.v AS DOUBLE) / (b2.d - a.d) AS sl,
        |              a.d AS da, b2.d AS db
        |       FROM di a JOIN di b2 ON b2.event_type = a.event_type
        |                           AND b2.d > a.d),
        |rk AS (SELECT event_type, sl,
        |              row_number() OVER (PARTITION BY event_type
        |                                 ORDER BY sl, da, db) AS r,
        |              count(*) OVER (PARTITION BY event_type) AS np
        |       FROM pr),
        |md AS (SELECT event_type, CAST(np AS BIGINT) AS n_pairs,
        |              avg(sl) AS msl
        |       FROM rk
        |       WHERE r = (np + 1) // 2 OR r = (np + 2) // 2
        |       GROUP BY event_type, np),
        |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        |       FROM di GROUP BY event_type)
        |SELECT nd.event_type, nd.n_days, md.n_pairs,
        |       round(md.msl / 100.0, 6) AS sen_slope_usd_per_day
        |FROM nd JOIN md USING (event_type)
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val dr = t(s, d, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
      val b = dr.agg(min("day").as("d0"))
      val di = dr.crossJoin(broadcast(b))
        .select(col("event_type"), datediff(col("day"), col("d0")).as("d"),
          col("v"))
        .localCheckpoint(true) // self-joined into day pairs + n_days agg
      val a2 = di.select(col("event_type"), col("d").as("da"), col("v").as("va"))
      val b2 = di.select(col("event_type"), col("d").as("db"), col("v").as("vb"))
      val pr = a2.join(b2, Seq("event_type")).filter(col("db") > col("da"))
        .select(col("event_type"),
          ((col("vb") - col("va")).cast("double") / (col("db") - col("da")))
            .as("sl"), col("da"), col("db"))
      val wR = Window.partitionBy("event_type").orderBy("sl", "da", "db")
      val wN = Window.partitionBy("event_type")
      val rk = pr.withColumn("r", row_number().over(wR))
        .withColumn("np", count(lit(1)).over(wN))
      val md2 = rk.filter(col("r") === expr("(np + 1) div 2") ||
          col("r") === expr("(np + 2) div 2"))
        .groupBy(col("event_type"), col("np").cast("long").as("n_pairs"))
        .agg(avg("sl").as("msl"))
      val nd = di.groupBy("event_type").agg(count(lit(1)).as("n_days"))
      nd.join(md2, "event_type")
        .select(col("event_type"), col("n_days"), col("n_pairs"),
          round(col("msl") / 100.0, 6).as("sen_slope_usd_per_day"))
        .orderBy("event_type")
    },

    // Kendall tau-b between every pair of event types' daily-revenue
    // series — the concordance read ("do these two streams move
    // together?") that, unlike Pearson/Spearman, is exact under ties and
    // needs no rank machinery: just pair counting. BOTH pair worlds are
    // span-bounded: the type-pair frame is |types|² rows per day and the
    // day-pair self-join is (|days| choose 2) per type pair — corpus size
    // only moves the daily aggregate, never the joins. Concordant /
    // discordant / tie counts are exact integers off exact BIGINT cents;
    // tau-b's denominator uses the pair-count identities n0−Ta = C+D+tb,
    // n0−Tb = C+D+ta, so the whole statistic is ONE double expression
    // over exact integers.
    QueryDef.sql(
      "q305_kendall_tau",
      """WITH dv AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                   CAST(sum(CAST(round(value * 100) AS BIGINT))
        |                        AS BIGINT) AS v
        |            FROM events GROUP BY 1, 2),
        |tp AS (SELECT a.event_type AS ta, b.event_type AS tb,
        |              a.day, a.v AS va, b.v AS vb
        |       FROM dv a JOIN dv b ON a.day = b.day
        |                          AND a.event_type < b.event_type),
        |pp AS (SELECT p.ta, p.tb,
        |              CAST(count(CASE WHEN (p.va - q.va) * (p.vb - q.vb) > 0
        |                          THEN 1 END) AS BIGINT) AS c,
        |              CAST(count(CASE WHEN (p.va - q.va) * (p.vb - q.vb) < 0
        |                          THEN 1 END) AS BIGINT) AS dd,
        |              CAST(count(CASE WHEN p.va = q.va AND p.vb <> q.vb
        |                          THEN 1 END) AS BIGINT) AS ea,
        |              CAST(count(CASE WHEN p.vb = q.vb AND p.va <> q.va
        |                          THEN 1 END) AS BIGINT) AS eb
        |       FROM tp p JOIN tp q ON p.ta = q.ta AND p.tb = q.tb
        |                          AND p.day < q.day
        |       GROUP BY 1, 2),
        |nd AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS n_days
        |       FROM tp GROUP BY 1, 2)
        |SELECT nd.ta AS type_a, nd.tb AS type_b, nd.n_days,
        |       pp.c AS concordant, pp.dd AS discordant,
        |       pp.ea AS ties_a_only, pp.eb AS ties_b_only,
        |       round(CAST(pp.c - pp.dd AS DOUBLE)
        |             / sqrt(CAST(pp.c + pp.dd + pp.eb AS DOUBLE)
        |                    * CAST(pp.c + pp.dd + pp.ea AS DOUBLE)),
        |             6) AS tau_b
        |FROM nd JOIN pp ON nd.ta = pp.ta AND nd.tb = pp.tb
        |WHERE pp.c + pp.dd + pp.eb > 0 AND pp.c + pp.dd + pp.ea > 0
        |ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
      val dv = t(s, d, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
      val tp = dv.as("a").join(dv.as("b"),
          col("a.day") === col("b.day") &&
            col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"),
          col("a.day").as("day"), col("a.v").as("va"), col("b.v").as("vb"))
        .localCheckpoint(true) // span-bounded; self-joined into day pairs
      val dif = (x: String, y: String) => col(s"p.$x") - col(s"q.$y")
      val pp = tp.as("p").join(tp.as("q"),
          col("p.ta") === col("q.ta") && col("p.tb") === col("q.tb") &&
            col("p.day") < col("q.day"))
        .groupBy(col("p.ta").as("ta"), col("p.tb").as("tb"))
        .agg(
          count(when(dif("va", "va") * dif("vb", "vb") > 0, 1)).as("c"),
          count(when(dif("va", "va") * dif("vb", "vb") < 0, 1)).as("dd"),
          count(when(col("p.va") === col("q.va") &&
            col("p.vb") =!= col("q.vb"), 1)).as("ea"),
          count(when(col("p.vb") === col("q.vb") &&
            col("p.va") =!= col("q.va"), 1)).as("eb"))
      val nd = tp.groupBy("ta", "tb").agg(count(lit(1)).as("n_days"))
      nd.join(pp, Seq("ta", "tb"))
        .filter(col("c") + col("dd") + col("eb") > 0 &&
          col("c") + col("dd") + col("ea") > 0)
        .select(col("ta").as("type_a"), col("tb").as("type_b"),
          col("n_days"), col("c").as("concordant"),
          col("dd").as("discordant"), col("ea").as("ties_a_only"),
          col("eb").as("ties_b_only"),
          round((col("c") - col("dd")).cast("double")
            / sqrt((col("c") + col("dd") + col("eb")).cast("double")
              * (col("c") + col("dd") + col("ea")).cast("double")), 6)
            .as("tau_b"))
        .orderBy("type_a", "type_b")
    },

    // Offline CUSUM changepoint per event type: the day k maximizing
    // |Σ_{i≤k}(x_i − x̄)| over the daily-revenue series — the "did the
    // level shift, and when" read behind regression triage and data-
    // incident timelines. The statistic is kept EXACT by clearing the
    // mean's denominator: C_k = n·P_k − k·S (prefix sums and totals in
    // BIGINT cents, n·P bounded by span·corpus-cents, far under 2^63), so
    // argmax/tie-break run on integers and both engines elect the same
    // day. All windows run over the span-bounded per-type daily frame.
    // Output includes the exact before/after mean levels — each ONE
    // double division of exact integers.
    QueryDef.sql(
      "q306_cusum_changepoint",
      """WITH dr AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                   CAST(sum(CAST(round(value * 100) AS BIGINT))
        |                        AS BIGINT) AS v
        |            FROM events GROUP BY 1, 2),
        |pf AS (SELECT event_type, day, v,
        |              CAST(row_number() OVER w AS BIGINT) AS k,
        |              CAST(sum(v) OVER w AS BIGINT) AS p,
        |              CAST(count(*) OVER (PARTITION BY event_type)
        |                   AS BIGINT) AS n,
        |              CAST(sum(v) OVER (PARTITION BY event_type)
        |                   AS BIGINT) AS s
        |       FROM dr
        |       WINDOW w AS (PARTITION BY event_type ORDER BY day
        |                    ROWS BETWEEN UNBOUNDED PRECEDING
        |                             AND CURRENT ROW)),
        |cu AS (SELECT event_type, day, k, n, p, s,
        |              abs(n * p - k * s) AS c
        |       FROM pf WHERE k < n),
        |el AS (SELECT event_type, day, k, n, p, s, c,
        |              row_number() OVER (PARTITION BY event_type
        |                                 ORDER BY c DESC, day) AS r
        |       FROM cu)
        |SELECT event_type, n AS n_days, day AS cp_day, k AS cp_k,
        |       round(CAST(c AS DOUBLE) / n / 100.0, 6) AS cusum_usd,
        |       round(CAST(p AS DOUBLE) / k / 100.0, 6) AS mean_before_usd,
        |       round(CAST(s - p AS DOUBLE) / (n - k) / 100.0, 6)
        |         AS mean_after_usd
        |FROM el WHERE r = 1 AND n >= 2
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      val dr = t(s, d, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wT = Window.partitionBy("event_type")
      val pf = dr.select(col("event_type"), col("day"), col("v"),
        row_number().over(Window.partitionBy("event_type").orderBy("day"))
          .cast("long").as("k"),
        sum("v").over(w).as("p"),
        count(lit(1)).over(wT).as("n"), sum("v").over(wT).as("s"))
      val cu = pf.filter(col("k") < col("n"))
        .withColumn("c", abs(col("n") * col("p") - col("k") * col("s")))
      val el = cu.withColumn("r", row_number().over(
        Window.partitionBy("event_type").orderBy(col("c").desc, col("day"))))
      el.filter(col("r") === 1 && col("n") >= 2)
        .select(col("event_type"), col("n").as("n_days"),
          col("day").as("cp_day"), col("k").as("cp_k"),
          round(col("c").cast("double") / col("n") / 100.0, 6)
            .as("cusum_usd"),
          round(col("p").cast("double") / col("k") / 100.0, 6)
            .as("mean_before_usd"),
          round((col("s") - col("p")).cast("double")
            / (col("n") - col("k")) / 100.0, 6).as("mean_after_usd"))
        .orderBy("event_type")
    },

    // MASE — mean absolute scaled error of the weekly seasonal-naive
    // forecast (x̂_i = x_{i−7 obs}) against the in-sample naive-1 scale,
    // per event type: the scale-free "is weekly seasonality actually
    // predictive here" score (Hyndman & Koehler 2006) that lets revenue
    // streams of different magnitudes share one forecastability ranking.
    // Lags are OBSERVATION lags over the span-bounded per-type daily
    // frame (gap days compress, identically in both engines); absolute
    // errors are exact BIGINT cents, their sums exact, and the final
    // MASE / MAE readouts are fixed double trees over those integers.
    QueryDef.sql(
      "q307_mase",
      """WITH dr AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                   CAST(sum(CAST(round(value * 100) AS BIGINT))
        |                        AS BIGINT) AS v
        |            FROM events GROUP BY 1, 2),
        |lg AS (SELECT event_type, v,
        |              lag(v, 1) OVER (PARTITION BY event_type
        |                              ORDER BY day) AS l1,
        |              lag(v, 7) OVER (PARTITION BY event_type
        |                              ORDER BY day) AS l7
        |       FROM dr),
        |ag AS (SELECT event_type,
        |              CAST(count(*) AS BIGINT) AS n_days,
        |              CAST(count(l1) AS BIGINT) AS n1,
        |              CAST(sum(abs(v - l1)) AS BIGINT) AS s1,
        |              CAST(count(l7) AS BIGINT) AS n7,
        |              CAST(sum(abs(v - l7)) AS BIGINT) AS s7
        |       FROM lg GROUP BY 1)
        |SELECT event_type, n_days,
        |       round(CAST(s1 AS DOUBLE) / n1 / 100.0, 6) AS mae_naive_usd,
        |       round(CAST(s7 AS DOUBLE) / n7 / 100.0, 6)
        |         AS mae_seasonal_usd,
        |       round((CAST(s7 AS DOUBLE) / n7) / (CAST(s1 AS DOUBLE) / n1),
        |             6) AS mase
        |FROM ag WHERE n7 > 0 AND s1 > 0
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      val dr = t(s, d, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val lg = dr.select(col("event_type"), col("v"),
        lag("v", 1).over(w).as("l1"), lag("v", 7).over(w).as("l7"))
      val ag = lg.groupBy("event_type").agg(
        count(lit(1)).as("n_days"), count("l1").as("n1"),
        sum(abs(col("v") - col("l1"))).as("s1"),
        count("l7").as("n7"), sum(abs(col("v") - col("l7"))).as("s7"))
      ag.filter(col("n7") > 0 && col("s1") > 0)
        .select(col("event_type"), col("n_days"),
          round(col("s1").cast("double") / col("n1") / 100.0, 6)
            .as("mae_naive_usd"),
          round(col("s7").cast("double") / col("n7") / 100.0, 6)
            .as("mae_seasonal_usd"),
          round((col("s7").cast("double") / col("n7"))
            / (col("s1").cast("double") / col("n1")), 6).as("mase"))
        .orderBy("event_type")
    },

    // Burstiness per event type: Fano factor (variance-to-mean of daily
    // counts) and the Goh–Barabási burstiness score B = (σ−μ)/(σ+μ) —
    // the "is this stream Poisson or bursty" read that sizes streaming
    // state (ST4) and ingest buffers (S2) for the WORST day, not the
    // average one. Zero days count: the grid joins the full corpus date
    // span (data-derived) so silent days pull the mean down and push
    // variance up, identically in both engines. Daily counts are exact
    // integers, the power sums exact BIGINTs, and σ/μ/Fano/B are ONE
    // shared double template (FanoExprs) over those integers.
    QueryDef.sql(
      "q312_burstiness",
      s"""WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                   CAST(count(*) AS BIGINT) AS c
        |            FROM events GROUP BY 1, 2),
        |sp AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        |       FROM events),
        |ds AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |                   AS DATE) AS day
        |       FROM sp),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |grid AS (SELECT ty.event_type, ds.day FROM ty CROSS JOIN ds),
        |fl AS (SELECT g.event_type, coalesce(dc.c, 0) AS c
        |       FROM grid g LEFT JOIN dc ON g.event_type = dc.event_type
        |                               AND g.day = dc.day),
        |ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(c) AS BIGINT) AS s1,
        |              CAST(sum(c * c) AS BIGINT) AS s2
        |       FROM fl GROUP BY 1)
        |SELECT event_type, n AS n_days,
        |       round(${FanoExprs.mean}, 6) AS mean_per_day,
        |       round(${FanoExprs.fano}, 6) AS fano,
        |       round(${FanoExprs.burst}, 6) AS burstiness
        |FROM ag WHERE s1 > 0
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
        .select(col("event_type"), col("ts").cast("date").as("day"))
        .localCheckpoint(true) // skinny; feeds counts, span, and types
      val dc = ev.groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      val sp = ev.agg(min("day").as("d0"), max("day").as("d1"))
      val ds = sp.select(explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("day"))
      val ty = ev.select("event_type").distinct()
      val grid = ty.crossJoin(broadcast(ds))
      val fl = grid.join(dc, Seq("event_type", "day"), "left")
        .select(col("event_type"), coalesce(col("c"), lit(0L)).as("c"))
      val ag = fl.groupBy("event_type").agg(count(lit(1)).as("n"),
        sum("c").as("s1"), sum(col("c") * col("c")).as("s2"))
      ag.filter(col("s1") > 0)
        .selectExpr("event_type", "n AS n_days",
          s"round(${FanoExprs.mean}, 6) AS mean_per_day",
          s"round(${FanoExprs.fano}, 6) AS fano",
          s"round(${FanoExprs.burst}, 6) AS burstiness")
        .orderBy("event_type")
    }
  )

  /** q312's moment algebra, ONE textual definition parsed by both engines
    * (the MomentExprs discipline) over the exact n/s1/s2 BIGINTs. */
  private object FanoExprs {
    val mean = "(CAST(s1 AS DOUBLE) / n)"
    private val v = s"(CAST(s2 AS DOUBLE) / n - $mean * $mean)"
    val fano = s"($v / $mean)"
    val burst = s"((sqrt($v) - $mean) / (sqrt($v) + $mean))"
  }

  private val ewmaDefs: Seq[QueryDef] = Seq(

    // Exponentially-weighted moving average (λ=0.2) of daily revenue per
    // event type — the recursive smoother (s_t = λx_t + (1−λ)s_{t−1})
    // that a closed-form window can only approximate; here the recursion
    // runs AS a recursion in both engines (WITH RECURSIVE — Spark's
    // UnionLoop, the q91 machinery), one frontier join per day over the
    // span-bounded daily frame, depth = |days|. State is EXACT: integer
    // cents with the λ=1/5 update s' = (2x + 8s) div 10 evaluated in
    // truncating integer division by both engines, so every smoothed
    // value is bit-identical at every recursion depth — no float
    // accumulation exists at all.
    QueryDef.sql(
      "q316_ewma",
      """WITH RECURSIVE
        |dr AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |              CAST(sum(CAST(round(value * 100) AS BIGINT))
        |                   AS BIGINT) AS v
        |       FROM events GROUP BY 1, 2),
        |di AS (SELECT event_type, day, v,
        |              CAST(row_number() OVER (PARTITION BY event_type
        |                                      ORDER BY day) AS BIGINT) AS k
        |       FROM dr),
        |ew AS (
        |  SELECT event_type, day, k, v, v AS sm FROM di WHERE k = 1
        |  UNION ALL
        |  SELECT d.event_type, d.day, d.k, d.v, (2 * d.v + 8 * e.sm) // 10
        |  FROM ew e JOIN di d ON d.event_type = e.event_type
        |                     AND d.k = e.k + 1)
        |SELECT event_type, day, round(CAST(v AS DOUBLE) / 100.0, 6)
        |         AS rev_usd,
        |       round(CAST(sm AS DOUBLE) / 100.0, 6) AS ewma_usd
        |FROM ew ORDER BY event_type, day""".stripMargin) { (s, d) =>
      // The oracle runs the recurrence AS a recursion; Spark-side, a
      // per-day UnionLoop (the q91 machinery, tried first) costs one
      // scheduler barrier per DAY — 30 sequential tiny joins, ~6 s of
      // pure overhead for a span-bounded scan. The Spark-first shape for
      // a sequential scan over a BOUNDED per-key series is a higher-order
      // aggregate() fold inside one codegen'd pass: sort each type's
      // (day, v) array once, fold the integer update left-to-right
      // (exactly the recursion order, same truncating `div`), re-explode.
      // One shuffle, zero barriers, bit-identical state.
      val dr = t(s, d, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
      dr.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("day"), col("v"))))
          .as("a"))
        .selectExpr("event_type",
          "transform(a, x -> x.day) AS days",
          "transform(a, x -> x.v) AS vs")
        .selectExpr("event_type", "days", "vs",
          """aggregate(slice(vs, 2, size(vs) - 1), array(vs[0]),
            |  (acc, x) -> array_append(acc,
            |    (2 * x + 8 * element_at(acc, size(acc))) div 10))
            |  AS sms""".stripMargin)
        .selectExpr("event_type",
          "explode(arrays_zip(days, vs, sms)) AS z")
        .selectExpr("event_type", "z.days AS day",
          "round(CAST(z.vs AS DOUBLE) / 100.0, 6) AS rev_usd",
          "round(CAST(z.sms AS DOUBLE) / 100.0, 6) AS ewma_usd")
        .orderBy("event_type", "day")
    },

    // Lead–lag profile: Pearson cross-correlation of every event-type
    // pair's daily-revenue series at lags −7..+7 over the zero-filled
    // date grid, electing the lag with the strongest |r| — the "does
    // signup move 3 days before purchase" read that turns q305's
    // same-day concordance into an actionable lead indicator. Every
    // frame after the daily rollup is span-bounded (types² × 15 lags ×
    // ≤|days| rows); daily values reduce to exact integer USD, the five
    // power sums per (pair, lag) are exact BIGINTs, r is ONE shared
    // double template, and the argmax orders by (|r| DESC, lag) on
    // bit-identical doubles.
    QueryDef.sql(
      "q317_lead_lag",
      s"""WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                   CAST(sum(CAST(round(value * 100) AS BIGINT))
        |                        AS BIGINT) AS c
        |            FROM events GROUP BY 1, 2),
        |sp AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        |       FROM events),
        |ds AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
        |                   AS DATE) AS day
        |       FROM sp),
        |dk AS (SELECT day, row_number() OVER (ORDER BY day) AS k FROM ds),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |fl AS (SELECT ty.event_type, dk.k,
        |              coalesce(dc.c, 0) // 100 AS v
        |       FROM ty CROSS JOIN dk
        |            LEFT JOIN dc ON ty.event_type = dc.event_type
        |                        AND dk.day = dc.day),
        |lg AS (SELECT unnest(generate_series(-7, 7)) AS l),
        |pr AS (SELECT a.event_type AS ta, b.event_type AS tb, l.l,
        |              a.v AS va, b.v AS vb
        |       FROM fl a CROSS JOIN lg l
        |            JOIN fl b ON b.k = a.k + l.l
        |                     AND a.event_type < b.event_type),
        |ag AS (SELECT ta, tb, l, CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(va) AS BIGINT) AS sa,
        |              CAST(sum(vb) AS BIGINT) AS sb,
        |              CAST(sum(va * va) AS BIGINT) AS saa,
        |              CAST(sum(vb * vb) AS BIGINT) AS sbb,
        |              CAST(sum(va * vb) AS BIGINT) AS sab
        |       FROM pr GROUP BY 1, 2, 3),
        |rr AS (SELECT ta, tb, l, n, ${CcfExprs.r} AS r
        |       FROM ag
        |       WHERE ${CcfExprs.varGuard}),
        |el AS (SELECT ta, tb, l, n, r,
        |              row_number() OVER (PARTITION BY ta, tb
        |                                 ORDER BY abs(r) DESC, l) AS rk
        |       FROM rr)
        |SELECT e.ta AS type_a, e.tb AS type_b, e.n AS n_overlap,
        |       CAST(e.l AS BIGINT) AS best_lag, round(e.r, 6) AS r_best,
        |       round(z.r, 6) AS r_lag0
        |FROM el e JOIN (SELECT ta, tb, r FROM rr WHERE l = 0) z
        |  ON e.ta = z.ta AND e.tb = z.tb
        |WHERE e.rk = 1
        |ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
      val dc = t(s, d, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("c"))
      val sp = t(s, d, "events")
        .agg(min(col("ts").cast("date")).as("d0"),
          max(col("ts").cast("date")).as("d1"))
      val dk = sp.select(explode(sequence(col("d0"), col("d1"),
          expr("interval 1 day"))).as("day"))
        .withColumn("k", row_number().over(
          Window.partitionBy(lit(1)).orderBy("day")))
      val ty = t(s, d, "events").select("event_type").distinct()
      val fl = ty.crossJoin(broadcast(dk))
        .join(dc, Seq("event_type", "day"), "left")
        .selectExpr("event_type", "k", "coalesce(c, 0) div 100 AS v")
        .localCheckpoint(true) // span×types rows; self-joined per lag
      val lg = s.range(-7, 8).select(col("id").cast("int").as("l"))
      val pr = fl.as("a").crossJoin(broadcast(lg))
        .join(fl.as("b"),
          col("b.k") === col("a.k") + col("l") &&
            col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"),
          col("l"), col("a.v").as("va"), col("b.v").as("vb"))
      val ag = pr.groupBy("ta", "tb", "l").agg(count(lit(1)).as("n"),
        sum("va").as("sa"), sum("vb").as("sb"),
        sum(col("va") * col("va")).as("saa"),
        sum(col("vb") * col("vb")).as("sbb"),
        sum(col("va") * col("vb")).as("sab"))
      val rr = ag.filter(expr(CcfExprs.varGuard))
        .selectExpr("ta", "tb", "l", "n", s"${CcfExprs.r} AS r")
        .localCheckpoint(true) // types²×15 rows; argmax + lag-0 join
      val el = rr.withColumn("rk", row_number().over(
        Window.partitionBy("ta", "tb").orderBy(abs(col("r")).desc, col("l"))))
      el.filter(col("rk") === 1)
        .join(rr.filter(col("l") === 0)
          .select(col("ta"), col("tb"), col("r").as("r0")), Seq("ta", "tb"))
        .select(col("ta").as("type_a"), col("tb").as("type_b"),
          col("n").as("n_overlap"), col("l").cast("long").as("best_lag"),
          round(col("r"), 6).as("r_best"), round(col("r0"), 6).as("r_lag0"))
        .orderBy("type_a", "type_b")
    }
  )

  private val profileDefs: Seq[QueryDef] = Seq(

    // Matrix profile (Yeh/Keogh 2016) of each type's daily-revenue
    // series, window m=7: for every window, the correlation to its best
    // match outside the ±3 exclusion zone — the motif (best-matched pair)
    // and discord (worst best-match = the anomaly a threshold rule can't
    // see) in one readout. The z-normalized distance is monotone in
    // −corr, so the profile works entirely on Pearson correlations built
    // from EXACT BIGINT window sums: windows come off a 7-offset grid
    // join over the span-bounded daily frame (no window functions, no
    // doubles until the final corr template), pairs are (|days|−6)²
    // per type — span-bounded, corpus-independent — and argmin/argmax
    // order bit-identical doubles with index tiebreaks.
    QueryDef.sql(
      "q324_matrix_profile",
      s"""WITH dr AS (SELECT event_type, day, c // 100 AS v FROM (
        |              SELECT event_type, CAST(ts AS DATE) AS day,
        |                     CAST(sum(CAST(round(value * 100) AS BIGINT))
        |                          AS BIGINT) AS c
        |              FROM events GROUP BY 1, 2)),
        |di AS (SELECT event_type, v,
        |              CAST(row_number() OVER (PARTITION BY event_type
        |                                      ORDER BY day) AS BIGINT) AS k,
        |              CAST(count(*) OVER (PARTITION BY event_type)
        |                   AS BIGINT) AS n
        |       FROM dr),
        |og AS (SELECT CAST(unnest(generate_series(0, 6)) AS BIGINT) AS o),
        |wi AS (SELECT d.event_type, d.k - o.o AS w,
        |              CAST(sum(d.v) AS BIGINT) AS s1,
        |              CAST(sum(d.v * d.v) AS BIGINT) AS s2,
        |              CAST(count(*) AS BIGINT) AS m
        |       FROM di d CROSS JOIN og o
        |       WHERE d.k - o.o >= 1 AND d.k - o.o <= d.n - 6
        |       GROUP BY 1, 2),
        |wp AS (SELECT x.event_type, x.w AS wa, y.w AS wb
        |       FROM wi x JOIN wi y ON y.event_type = x.event_type
        |                          AND y.w > x.w + 3),
        |xp AS (SELECT p.event_type, p.wa, p.wb,
        |              CAST(sum(a.v * b.v) AS BIGINT) AS sab
        |       FROM wp p CROSS JOIN og o
        |            JOIN di a ON a.event_type = p.event_type
        |                     AND a.k = p.wa + o.o
        |            JOIN di b ON b.event_type = p.event_type
        |                     AND b.k = p.wb + o.o
        |       GROUP BY 1, 2, 3),
        |pc AS (SELECT x.event_type, x.wa, x.wb, ${MpExprs.corr} AS r
        |       FROM xp x
        |            JOIN (SELECT event_type, w, s1 AS s1a, s2 AS s2a, m
        |                  FROM wi) a
        |              ON a.event_type = x.event_type AND a.w = x.wa
        |            JOIN (SELECT event_type, w, s1 AS s1b, s2 AS s2b
        |                  FROM wi) b
        |              ON b.event_type = x.event_type AND b.w = x.wb
        |       WHERE ${MpExprs.varGuard}),
        |sym AS (SELECT event_type, wa AS w, wb AS o, r FROM pc
        |        UNION ALL
        |        SELECT event_type, wb, wa, r FROM pc),
        |bm AS (SELECT event_type, w, o, r,
        |              row_number() OVER (PARTITION BY event_type, w
        |                                 ORDER BY r DESC, o) AS rk
        |       FROM sym),
        |pr AS (SELECT event_type, w, o, r FROM bm WHERE rk = 1),
        |mot AS (SELECT event_type, w, o, r,
        |               row_number() OVER (PARTITION BY event_type
        |                                  ORDER BY r DESC, w, o) AS rk
        |        FROM pr),
        |dis AS (SELECT event_type, w, o, r,
        |               row_number() OVER (PARTITION BY event_type
        |                                  ORDER BY r ASC, w, o) AS rk
        |        FROM pr)
        |SELECT m.event_type AS event_type,
        |       m.w AS motif_a, m.o AS motif_b, round(m.r, 6) AS motif_corr,
        |       d.w AS discord_w, round(d.r, 6) AS discord_best_corr
        |FROM (SELECT * FROM mot WHERE rk = 1) m
        |JOIN (SELECT * FROM dis WHERE rk = 1) d
        |  ON m.event_type = d.event_type
        |ORDER BY m.event_type""".stripMargin) { (s, d) =>
      // Daily values in whole USD, not cents (q317's `div 100` rescale,
      // round-10 ADVICE): s2 = Σv² and the sab cross-dot accumulate into
      // BIGINT, and cents-squared runs out of headroom near ~$11M/day/type
      // (7·v² ≈ 2^63) — where DuckDB errors but Spark Long wraps silently.
      // USD-squared pushes the bound to ~$1.1B/day/type.
      val dr = t(s, d, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("c"))
        .selectExpr("event_type", "day", "c div 100 AS v")
      val wN = Window.partitionBy("event_type")
      val di = dr.select(col("event_type"), col("v"),
          row_number().over(wN.orderBy("day")).cast("long").as("k"),
          count(lit(1)).over(wN).as("n"))
        .localCheckpoint(true) // span-bounded; window sums + cross dots
      val og = s.range(0, 7).select(col("id").as("o"))
      val wi = di.crossJoin(broadcast(og))
        .filter(col("k") - col("o") >= 1 && col("k") - col("o") <= col("n") - 6)
        .groupBy(col("event_type"), (col("k") - col("o")).as("w"))
        .agg(sum("v").as("s1"), sum(col("v") * col("v")).as("s2"),
          count(lit(1)).as("m"))
        .localCheckpoint(true) // windows frame; joined twice into pairs
      val wp = wi.selectExpr("event_type", "w AS wa")
        .join(wi.selectExpr("event_type AS et2", "w AS wb"),
          expr("et2 = event_type AND wb > wa + 3"))
        .select("event_type", "wa", "wb")
      val xp = wp.crossJoin(broadcast(og))
        .join(di.selectExpr("event_type AS eta", "k AS ka", "v AS va"),
          expr("eta = event_type AND ka = wa + o"))
        .join(di.selectExpr("event_type AS etb", "k AS kb", "v AS vb"),
          expr("etb = event_type AND kb = wb + o"))
        .groupBy("event_type", "wa", "wb")
        .agg(sum(col("va") * col("vb")).as("sab"))
      val pc = xp
        .join(wi.selectExpr("event_type", "w AS wa", "s1 AS s1a",
          "s2 AS s2a", "m"), Seq("event_type", "wa"))
        .join(wi.selectExpr("event_type", "w AS wb", "s1 AS s1b",
          "s2 AS s2b"), Seq("event_type", "wb"))
        .filter(expr(MpExprs.varGuard))
        .selectExpr("event_type", "wa", "wb", s"${MpExprs.corr} AS r")
      val sym = pc.selectExpr("event_type", "wa AS w", "wb AS o", "r")
        .unionByName(pc.selectExpr("event_type", "wb AS w", "wa AS o", "r"))
      val pr = sym.withColumn("rk", row_number().over(
          Window.partitionBy("event_type", "w").orderBy(col("r").desc,
            col("o"))))
        .filter(col("rk") === 1).drop("rk")
        .localCheckpoint(true) // ≤|windows| rows; motif + discord argmax
      val mot = pr.withColumn("rk", row_number().over(
          Window.partitionBy("event_type")
            .orderBy(col("r").desc, col("w"), col("o"))))
        .filter(col("rk") === 1)
        .selectExpr("event_type", "w AS motif_a", "o AS motif_b",
          "round(r, 6) AS motif_corr")
      val dis = pr.withColumn("rk", row_number().over(
          Window.partitionBy("event_type")
            .orderBy(col("r").asc, col("w"), col("o"))))
        .filter(col("rk") === 1)
        .selectExpr("event_type", "w AS discord_w",
          "round(r, 6) AS discord_best_corr")
      mot.join(dis, "event_type").orderBy("event_type")
    },

    // Mann–Kendall trend test per event type — the nonparametric
    // significance companion to q300's Theil–Sen slope: S = Σ sign-pairs
    // over the same span-bounded DAY-pair world, tie-corrected variance,
    // and the continuity-corrected z. Everything up to z is exact
    // integers (S, tie group sizes, the variance numerator over 18); z is
    // ONE shared double template, and the trend verdict at |z| > 1.96 is
    // a comparison of bit-identical doubles.
    QueryDef.sql(
      "q325_mann_kendall",
      s"""WITH dr AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                   CAST(sum(CAST(round(value * 100) AS BIGINT))
        |                        AS BIGINT) AS v
        |            FROM events GROUP BY 1, 2),
        |pr AS (SELECT a.event_type,
        |              CASE WHEN b.v > a.v THEN 1
        |                   WHEN b.v < a.v THEN -1 ELSE 0 END AS sg
        |       FROM dr a JOIN dr b ON b.event_type = a.event_type
        |                          AND b.day > a.day),
        |ss AS (SELECT event_type, CAST(sum(sg) AS BIGINT) AS s
        |       FROM pr GROUP BY 1),
        |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |       FROM dr GROUP BY 1),
        |tg AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS t
        |       FROM dr GROUP BY 1, 2),
        |tc AS (SELECT event_type,
        |              CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt
        |       FROM tg WHERE t > 1 GROUP BY 1),
        |vr AS (SELECT nd.event_type, nd.n, ss.s,
        |              CAST(nd.n * (nd.n - 1) * (2 * nd.n + 5)
        |                   - coalesce(tc.tt, 0) AS BIGINT) AS v18
        |       FROM nd JOIN ss ON nd.event_type = ss.event_type
        |               LEFT JOIN tc ON nd.event_type = tc.event_type)
        |SELECT event_type, n AS n_days, s,
        |       round(CAST(v18 AS DOUBLE) / 18.0, 6) AS var_s,
        |       round(${MkExprs.z}, 6) AS z,
        |       (abs(${MkExprs.z}) > 1.96) AS significant
        |FROM vr WHERE v18 > 0
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      val dr = t(s, d, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
        .localCheckpoint(true) // span-bounded daily; pairs + ties read it
      val pr = dr.as("a").join(dr.as("b"),
          col("b.event_type") === col("a.event_type") &&
            col("b.day") > col("a.day"))
        .select(col("a.event_type").as("event_type"),
          when(col("b.v") > col("a.v"), 1)
            .when(col("b.v") < col("a.v"), -1).otherwise(0).as("sg"))
      val ss = pr.groupBy("event_type").agg(sum("sg").as("s"))
      val nd = dr.groupBy("event_type").agg(count(lit(1)).as("n"))
      val tc = dr.groupBy("event_type", "v").agg(count(lit(1)).as("t"))
        .filter(col("t") > 1)
        .groupBy("event_type")
        .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
          .as("tt"))
      val vr = nd.join(ss, "event_type").join(tc, Seq("event_type"), "left")
        .select(col("event_type"), col("n"), col("s"),
          (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5)
            - coalesce(col("tt"), lit(0L))).as("v18"))
      vr.filter(col("v18") > 0)
        .selectExpr("event_type", "n AS n_days", "s",
          "round(CAST(v18 AS DOUBLE) / 18.0, 6) AS var_s",
          s"round(${MkExprs.z}, 6) AS z",
          s"(abs(${MkExprs.z}) > 1.96) AS significant")
        .orderBy("event_type")
    }
  )

  /** q324's window-pair Pearson algebra over exact m/s1/s2/sab BIGINTs —
    * ONE textual definition parsed by both engines. Column contract:
    * s1a/s2a and s1b/s2b are the two windows' exact sums, m the window
    * length, sab the exact cross dot. */
  private object MpExprs {
    private def D(c: String) = s"CAST($c AS DOUBLE)"
    val corr: String =
      s"((${D("m")} * ${D("sab")} - ${D("s1a")} * ${D("s1b")}) " +
        s"/ sqrt((${D("m")} * ${D("s2a")} - ${D("s1a")} * ${D("s1a")}) " +
        s"* (${D("m")} * ${D("s2b")} - ${D("s1b")} * ${D("s1b")})))"
    val varGuard: String =
      s"${D("m")} * ${D("s2a")} > ${D("s1a")} * ${D("s1a")} AND " +
        s"${D("m")} * ${D("s2b")} > ${D("s1b")} * ${D("s1b")}"
  }

  /** q325's continuity-corrected Mann–Kendall z over the exact s/v18
    * integers — ONE textual definition parsed by both engines. */
  private object MkExprs {
    val z: String =
      "(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1) " +
        "/ sqrt(CAST(v18 AS DOUBLE) / 18.0) " +
        "WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1) " +
        "/ sqrt(CAST(v18 AS DOUBLE) / 18.0) ELSE 0.0 END)"
  }

  /** q317's Pearson algebra over the exact n/sa/sb/saa/sbb/sab BIGINTs —
    * ONE textual definition parsed by both engines. */
  private object CcfExprs {
    private def D(c: String) = s"CAST($c AS DOUBLE)"
    val r: String =
      s"((${D("n")} * ${D("sab")} - ${D("sa")} * ${D("sb")}) " +
        s"/ sqrt((${D("n")} * ${D("saa")} - ${D("sa")} * ${D("sa")}) " +
        s"* (${D("n")} * ${D("sbb")} - ${D("sb")} * ${D("sb")})))"
    val varGuard: String =
      s"${D("n")} * ${D("saa")} > ${D("sa")} * ${D("sa")} AND " +
        s"${D("n")} * ${D("sbb")} > ${D("sb")} * ${D("sb")}"
  }
}
