package graft.queries

import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table — the batch analog of the
  * reference's ingest-side semantics (SURVEY.md §2.6): event-time partition
  * keys, time-bucketed aggregation, latest-state-per-key.
  */
object Events {

  def defs: Seq[QueryDef] = baseDefs ++ attributionDefs

  private val baseDefs: Seq[QueryDef] = Seq(

    // Event-time partition-key derivation (O15, stack.py:233): zero-padded
    // year/month/day strings — exactly the Hive layout tokens `stage/` uses.
    // At scale these become the partitionBy columns of the parquet sink.
    QueryDef.sql(
      "q30_partition_keys",
      """SELECT strftime(ts, '%Y') AS year, strftime(ts, '%m') AS month,
        |       strftime(ts, '%d') AS day,
        |       count(*) AS n_events,
        |       count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY year, month, day""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .select(
          date_format(col("ts"), "yyyy").as("year"),
          date_format(col("ts"), "MM").as("month"),
          date_format(col("ts"), "dd").as("day"),
          col("user_id"))
        .groupBy("year", "month", "day")
        .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("n_users"))
        .orderBy("year", "month", "day")
    },

    // Tumbling-window aggregation (ST1): epoch-aligned 1-hour buckets — the
    // batch shape of `groupBy(window($"ts", "1 hour"))` in the streaming path.
    QueryDef.sql(
      "q31_time_buckets",
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
        |       event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE ts < TIMESTAMP '2024-01-08'
        |GROUP BY 1, 2
        |ORDER BY bucket_start, event_type""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .filter(col("ts") < lit("2024-01-08").cast("timestamp"))
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), msum(col("value"), 6).as("sum_value"))
        .select(col("w.start").as("bucket_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("bucket_start", "event_type")
    },

    // Latest event per user — "latest heartbeat per device" (SURVEY.md §2.5),
    // the canonical streaming-state query as a ranking window.
    QueryDef.sql(
      "q32_latest_per_key",
      """SELECT user_id, event_id, event_type, value
        |FROM (SELECT user_id, event_id, event_type, value,
        |             row_number() OVER (PARTITION BY user_id
        |                                ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    },

    // Three-way classification + routing counts — the reference's record
    // router (O6, hello.py:69-133) shape: tag every record, count per route,
    // never drop silently (§2.8.4).
    QueryDef.sql(
      "q33_router_counts",
      """SELECT CASE WHEN event_type IN ('click', 'view') THEN 'soh'
        |            WHEN event_type = 'error' THEN 'unknown'
        |            ELSE 'sensor' END AS route,
        |       count(*) AS n,
        |       count(DISTINCT event_type) AS n_types
        |FROM events
        |GROUP BY 1
        |ORDER BY route""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .select(
          when(col("event_type").isin("click", "view"), "soh")
            .when(col("event_type") === "error", "unknown")
            .otherwise("sensor").as("route"),
          col("event_type"))
        .groupBy("route")
        .agg(count(lit(1)).as("n"), countDistinct("event_type").as("n_types"))
        .orderBy("route")
    },

    // Behavior co-occurrence (market-basket shape): which event-type pairs
    // the same user exhibits, with user counts per pair. The scale-safe
    // order: REDUCE to distinct (user, type) first — bounded at
    // users × |type domain| — THEN self-join a<b, so the pair join fans
    // out over the tiny per-user type set, never raw events.
    QueryDef.sql(
      "q142_cooccurrence",
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM ut a JOIN ut b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY a.event_type, b.event_type
        |ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
      val ut = t(s, d, "events").select("user_id", "event_type").distinct()
      ut.as("a").join(ut.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("type_a", "type_b")
    },

    // Exponentially time-decayed engagement score (half-life 1 day,
    // anchored at the corpus's last event): the standard recency-weighted
    // recsys feature. exp() per row is the one transcendental — identical
    // input doubles both engines, sum rounded 4dp (the q135 discipline).
    QueryDef.sql(
      "q143_decayed_score",
      """WITH mx AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS tmax FROM events)
        |SELECT user_id,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       round(sum(round(exp(-ln(2) * (tmax - CAST(floor(epoch(ts)) AS BIGINT))
        |                     / 86400.0), 10)), 4) AS decayed_score
        |FROM events CROSS JOIN mx
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
        .select(col("user_id"), col("ts").cast("long").as("es"))
      val mx = ev.agg(max("es").as("tmax"))
      // each exp() term is rounded at 10dp BEFORE the sum (the q135
      // discipline): JVM Math.exp and libm exp may differ in the last ulp,
      // and an unrounded sum could land on a 4dp half-boundary differently
      ev.crossJoin(broadcast(mx))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          round(sum(round(exp(lit(-math.log(2.0)) * (col("tmax") - col("es"))
            / 86400.0), 10)), 4).as("decayed_score"))
        .orderBy("user_id")
    },

    // Last-touch marketing attribution: each purchase credits the user's
    // most recent prior view/click within a 7-day lookback (or 'none'),
    // and revenue folds per channel. The per-user event timeline is ONE
    // window pass — last(..., ignoreNulls) over rows up to 1 PRECEDING,
    // partitioned by user (distributes like the user dimension; no self-
    // join of purchases against touches, which is the quadratic-per-user
    // shape this window form replaces). Ties at equal ts break by
    // event_id in both engines. Revenue sums through the exact-decimal
    // recipe, so the parity is bit-for-bit.
    QueryDef.sql(
      "q182_attribution",
      """WITH ev AS (SELECT user_id, ts, event_id, event_type, value
        |            FROM events
        |            WHERE event_type IN ('view', 'click', 'purchase')),
        |     w AS (SELECT user_id, ts, event_type, value,
        |                  last_value(CASE WHEN event_type <> 'purchase'
        |                                  THEN event_type END IGNORE NULLS)
        |                    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING
        |                               AND 1 PRECEDING) AS touch_type,
        |                  last_value(CASE WHEN event_type <> 'purchase'
        |                                  THEN ts END IGNORE NULLS)
        |                    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING
        |                               AND 1 PRECEDING) AS touch_ts
        |           FROM ev)
        |SELECT coalesce(CASE WHEN touch_ts >= ts - INTERVAL 7 DAY
        |                     THEN touch_type END, 'none') AS channel,
        |       count(*) AS n_purchases,
        |       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM w WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "ts", "event_id", "event_type", "value")
      val wU = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val touch = when(col("event_type") =!= "purchase", col("event_type"))
      val touchTs = when(col("event_type") =!= "purchase", col("ts"))
      ev.withColumn("touch_type", last(touch, ignoreNulls = true).over(wU))
        .withColumn("touch_ts", last(touchTs, ignoreNulls = true).over(wU))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(
            when(col("touch_ts") >= col("ts") - expr("INTERVAL 7 DAYS"),
              col("touch_type")), lit("none")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          msum(col("value"), 6).as("revenue"))
        .orderBy("channel")
    },

    // Association rules over the q142 co-occurrence shape: directed
    // support / confidence / lift per event-type pair — the market-basket
    // metrics a recommender or behavioral-segmentation pass ranks rules
    // by. Same scale-safe reduction (distinct (user, type) first, the
    // pair join fans out over each user's tiny type set); the three
    // ratios are single exact-integer divisions against the broadcast
    // per-type counts and user total.
    QueryDef.sql(
      "q186_association_rules",
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |     tc AS (SELECT event_type, count(*) AS c FROM ut GROUP BY 1),
        |     nu AS (SELECT count(DISTINCT user_id) AS n FROM events),
        |     p AS (SELECT a.event_type AS antecedent,
        |                  b.event_type AS consequent, count(*) AS n_both
        |           FROM ut a JOIN ut b
        |             ON a.user_id = b.user_id
        |            AND a.event_type <> b.event_type
        |           GROUP BY 1, 2)
        |SELECT antecedent, consequent, n_both,
        |       round(n_both / CAST(nu.n AS DOUBLE), 6) AS support,
        |       round(n_both / CAST(ca.c AS DOUBLE), 6) AS confidence,
        |       round(n_both * CAST(nu.n AS DOUBLE)
        |             / (CAST(ca.c AS DOUBLE) * cb.c), 6) AS lift
        |FROM p
        |JOIN tc ca ON p.antecedent = ca.event_type
        |JOIN tc cb ON p.consequent = cb.event_type
        |CROSS JOIN nu
        |ORDER BY antecedent, consequent""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val ut = ev.select("user_id", "event_type").distinct()
        .localCheckpoint(true) // feeds the pair join, type counts, user total
      val tc = ut.groupBy("event_type").agg(count(lit(1)).as("c"))
      val nu = ut.select("user_id").distinct().agg(count(lit(1)).as("n"))
      val p = ut.as("a").join(ut.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") =!= col("b.event_type"))
        .groupBy(col("a.event_type").as("antecedent"),
          col("b.event_type").as("consequent"))
        .agg(count(lit(1)).as("n_both"))
      p.join(broadcast(tc.select(col("event_type").as("antecedent"),
          col("c").as("ca"))), Seq("antecedent"))
        .join(broadcast(tc.select(col("event_type").as("consequent"),
          col("c").as("cb"))), Seq("consequent"))
        .crossJoin(broadcast(nu))
        .select(col("antecedent"), col("consequent"), col("n_both"),
          round(col("n_both") / col("n").cast("double"), 6).as("support"),
          round(col("n_both") / col("ca").cast("double"), 6).as("confidence"),
          round(col("n_both") * col("n").cast("double")
            / (col("ca").cast("double") * col("cb")), 6).as("lift"))
        .orderBy("antecedent", "consequent")
    },

    // First-order Markov transition profile over each user's event
    // timeline: counts and row-normalized probabilities of consecutive
    // (from → to) event-type pairs — the sequence-mining complement of
    // q186's unordered rules (what a next-action model or a funnel
    // designer reads). One lead() window PARTITIONED by user (ties at
    // equal ts break by event_id in both engines), then a 25-cell
    // aggregate; probabilities are exact divisions against the broadcast
    // per-from totals.
    QueryDef.sql(
      "q188_markov_transitions",
      """WITH seq AS (SELECT user_id, event_type AS from_type,
        |                    lead(event_type) OVER (PARTITION BY user_id
        |                                           ORDER BY ts, event_id)
        |                      AS to_type
        |             FROM events),
        |     tr AS (SELECT from_type, to_type, count(*) AS n_trans
        |            FROM seq WHERE to_type IS NOT NULL
        |            GROUP BY 1, 2),
        |     tot AS (SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS nf
        |             FROM tr GROUP BY 1)
        |SELECT tr.from_type, tr.to_type, tr.n_trans,
        |       round(tr.n_trans / CAST(tot.nf AS DOUBLE), 6) AS p
        |FROM tr JOIN tot ON tr.from_type = tot.from_type
        |ORDER BY tr.from_type, tr.to_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wU = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tr = t(s, d, "events")
        .select(col("user_id"), col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(wU).as("to_type"))
        .filter(col("to_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n_trans"))
        .localCheckpoint(true) // 25-cell frame; feeds totals AND output
      val tot = tr.groupBy("from_type").agg(sum("n_trans").as("nf"))
      tr.join(broadcast(tot), "from_type")
        .select(col("from_type"), col("to_type"), col("n_trans"),
          round(col("n_trans") / col("nf").cast("double"), 6).as("p"))
        .orderBy("from_type", "to_type")
    },

    // Signup → first-purchase conversion latency distribution — the
    // product-analytics question behind every activation dashboard.
    // Latencies are exact MICROSECOND integers (epoch_us both sides; a
    // seconds-level truncate would round the two timestamps differently
    // than their difference), so the interpolated percentiles land on
    // integers or exact halves and hash-match.
    QueryDef.sql(
      "q225_conversion_latency",
      """WITH su AS (SELECT user_id, min(ts) AS s0 FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |     lat AS (SELECT su.user_id,
        |                    CAST(min(epoch_us(p.ts)) - epoch_us(su.s0)
        |                         AS BIGINT) AS lat_us
        |             FROM su JOIN events p
        |               ON p.user_id = su.user_id
        |              AND p.event_type = 'purchase' AND p.ts >= su.s0
        |             GROUP BY su.user_id, su.s0)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |       quantile_cont(lat_us, 0.5) AS p50_us,
        |       quantile_cont(lat_us, 0.9) AS p90_us,
        |       CAST(min(lat_us) AS BIGINT) AS min_us,
        |       CAST(max(lat_us) AS BIGINT) AS max_us
        |FROM lat""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("s0"))
      val lat = ev.filter(col("event_type") === "purchase")
        .join(su, Seq("user_id"))
        .filter(col("ts") >= col("s0"))
        .groupBy("user_id", "s0")
        .agg((min(unix_micros(col("ts"))) - unix_micros(col("s0")))
          .as("lat_us"))
      lat.agg(count(lit(1)).as("n_converted"),
        expr("percentile(lat_us, 0.5)").as("p50_us"),
        expr("percentile(lat_us, 0.9)").as("p90_us"),
        min("lat_us").as("min_us"), max("lat_us").as("max_us"))
    },

    // Event-sequence pattern matching (the MATCH_RECOGNIZE niche Spark has
    // no operator for): detect view → view → purchase runs completing
    // within 30 minutes on each user's timeline. Two lag() columns over
    // one per-user window pass turn the pattern into a row predicate —
    // sequence detection without self-joins, state machines, or row
    // explosion; ties at equal ts break by event_id in both engines.
    QueryDef.sql(
      "q229_pattern_match",
      """WITH tl AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type, 1) OVER w AS t1,
        |         lag(event_type, 2) OVER w AS t2,
        |         lag(ts, 2) OVER w AS ts2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |     hits AS (SELECT user_id, event_id FROM tl
        |              WHERE event_type = 'purchase'
        |                AND t1 = 'view' AND t2 = 'view'
        |                AND ts <= ts2 + INTERVAL 30 MINUTE)
        |SELECT CAST(count(*) AS BIGINT) AS n_patterns,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(min(event_id) AS BIGINT) AS first_hit,
        |       CAST(max(event_id) AS BIGINT) AS last_hit
        |FROM hits""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tl = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          lag("event_type", 1).over(w).as("t1"),
          lag("event_type", 2).over(w).as("t2"),
          lag("ts", 2).over(w).as("ts2"))
      tl.filter(col("event_type") === "purchase" &&
          col("t1") === "view" && col("t2") === "view" &&
          col("ts") <= col("ts2") + expr("INTERVAL 30 MINUTE"))
        .agg(count(lit(1)).as("n_patterns"),
          countDistinct("user_id").as("n_users"),
          min("event_id").as("first_hit"), max("event_id").as("last_hit"))
    },

    // Cohort LTV triangle: users grouped by first-seen month, revenue
    // tracked by months-since-cohort — the retention-revenue matrix every
    // growth team maintains. Month arithmetic is all-integer
    // (y·12+m), revenue rounds once per cell over identical membership.
    QueryDef.sql(
      "q226_cohort_ltv",
      """WITH first AS (SELECT user_id,
        |                      CAST(min(date_part('year', ts) * 12
        |                               + date_part('month', ts)) AS BIGINT)
        |                        AS cohort_m
        |               FROM events GROUP BY user_id),
        |     p AS (SELECT f.cohort_m,
        |                  CAST(date_part('year', e.ts) * 12
        |                       + date_part('month', e.ts) AS BIGINT)
        |                    - f.cohort_m AS age_m,
        |                  e.user_id, e.value
        |           FROM events e JOIN first f ON e.user_id = f.user_id
        |           WHERE e.event_type = 'purchase')
        |SELECT cohort_m, age_m,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS active_users,
        |       round(sum(value), 6) AS revenue
        |FROM p GROUP BY cohort_m, age_m
        |ORDER BY cohort_m, age_m""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val mth = (year(col("ts")) * 12 + month(col("ts"))).cast("long")
      val first = ev.groupBy("user_id").agg(min(mth).as("cohort_m"))
      ev.filter(col("event_type") === "purchase")
        .join(first, Seq("user_id"))
        .select(col("cohort_m"), (mth - col("cohort_m")).as("age_m"),
          col("user_id"), col("value"))
        .groupBy("cohort_m", "age_m")
        .agg(countDistinct("user_id").as("active_users"),
          round(sum("value"), 6).as("revenue"))
        .orderBy("cohort_m", "age_m")
    },

    // Variable-gap funnel with an OPTIONAL step (round-8 verdict #9: the
    // 3+-step MATCH_RECOGNIZE family beyond q229's fixed two-lag pattern):
    // signup →(≤72 h, any events between)→ view →(≤12 h, any events
    // between)→ purchase, with click-between-view-and-purchase as the
    // optional step — MATCH_RECOGNIZE `SIG X* VIEW Y* CLK? Z* BUY` with
    // LAST-per-step semantics. No self-joins and no row explosion: two
    // per-user ordered window passes turn the pattern into a row
    // predicate. Pass 1 gives every row its running last-signup time and
    // running click count; pass 2 carries each row's LAST-VIEW state
    // (view time, that view's own last-signup, that view's click count)
    // forward via last_value(… IGNORE NULLS), so a purchase row holds the
    // whole matched path and the optional step is a subtraction of
    // running click counts. Scales as two sorts per user partition —
    // sequence length never materializes.
    QueryDef.sql(
      "q241_funnel_match",
      """WITH t1 AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         max(CASE WHEN event_type = 'signup' THEN ts END)
        |           OVER w AS sig_ts,
        |         count(CASE WHEN event_type = 'click' THEN 1 END)
        |           OVER w AS cum_clicks
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t2 AS (
        |  SELECT *,
        |         last_value(CASE WHEN event_type = 'view' THEN ts END
        |                    IGNORE NULLS) OVER w AS v_ts,
        |         last_value(CASE WHEN event_type = 'view' THEN sig_ts END
        |                    IGNORE NULLS) OVER w AS v_sig,
        |         last_value(CASE WHEN event_type = 'view' THEN cum_clicks END
        |                    IGNORE NULLS) OVER w AS v_clicks
        |  FROM t1
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |hits AS (
        |  SELECT user_id, ts, v_ts, cum_clicks - v_clicks AS clicks_between
        |  FROM t2
        |  WHERE event_type = 'purchase' AND v_ts IS NOT NULL
        |    AND ts <= v_ts + INTERVAL 12 HOUR
        |    AND v_sig IS NOT NULL AND v_ts <= v_sig + INTERVAL 72 HOUR)
        |SELECT CAST(count(*) AS BIGINT) AS n_funnels,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(count(CASE WHEN clicks_between > 0 THEN 1 END) AS BIGINT)
        |         AS n_with_click,
        |       CAST(count(CASE WHEN clicks_between = 0 THEN 1 END) AS BIGINT)
        |         AS n_skip_click,
        |       round(avg(date_diff('microseconds', v_ts, ts)) / 1e6, 6)
        |         AS avg_view_to_buy_sec
        |FROM hits""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val t1 = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          max(when(col("event_type") === "signup", col("ts"))).over(w)
            .as("sig_ts"),
          count(when(col("event_type") === "click", 1)).over(w)
            .as("cum_clicks"))
      val t2 = t1
        .withColumn("v_ts",
          last(when(col("event_type") === "view", col("ts")), true).over(w))
        .withColumn("v_sig",
          last(when(col("event_type") === "view", col("sig_ts")), true).over(w))
        .withColumn("v_clicks",
          last(when(col("event_type") === "view", col("cum_clicks")), true)
            .over(w))
      t2.filter(col("event_type") === "purchase" && col("v_ts").isNotNull &&
          col("ts") <= col("v_ts") + expr("INTERVAL 12 HOUR") &&
          col("v_sig").isNotNull &&
          col("v_ts") <= col("v_sig") + expr("INTERVAL 72 HOUR"))
        .select(col("user_id"), col("ts"), col("v_ts"),
          (col("cum_clicks") - col("v_clicks")).as("clicks_between"))
        .agg(count(lit(1)).as("n_funnels"),
          countDistinct("user_id").as("n_users"),
          count(when(col("clicks_between") > 0, 1)).as("n_with_click"),
          count(when(col("clicks_between") === 0, 1)).as("n_skip_click"),
          round(avg(expr("timestampdiff(MICROSECOND, v_ts, ts)")) / 1e6, 6)
            .as("avg_view_to_buy_sec"))
    },

    // First-order Markov transition matrix over each user's event
    // timeline — the user-journey model behind next-action prediction and
    // anomaly scoring. One lead() per user partition builds the
    // transition pairs (no self-join of the timeline against itself);
    // probabilities row-normalize with a window over the 5×5 aggregate —
    // a 25-row frame, so the second window is free. Counts are exact
    // integers; p rounds once after an integer/integer division both
    // engines evaluate identically.
    QueryDef.sql(
      "q254_markov_transitions",
      """WITH tl AS (
        |  SELECT event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS nxt
        |  FROM events)
        |SELECT event_type AS from_type, nxt AS to_type,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(count(*) / sum(count(*)) OVER (PARTITION BY event_type), 6)
        |         AS p
        |FROM tl WHERE nxt IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val rowW = Window.partitionBy("from_type")
      t(s, d, "events")
        .select(col("event_type"), col("user_id"), col("ts"), col("event_id"))
        .withColumn("nxt", lead("event_type", 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("nxt").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", round(col("n") / sum("n").over(rowW), 6))
        .select(col("from_type"), col("to_type"), col("n"), col("p"))
        .orderBy("from_type", "to_type")
    },

    // Peak concurrency via the SWEEP-LINE decomposition — the interval
    // question ("how many users were active at once?") that a naive
    // timestamp×interval join answers quadratically: each (user, day)
    // activity interval becomes a +1 at its start and a −1 at its end,
    // and the running sum over the day's ordered endpoint stream IS the
    // live count; its max is the day's peak. One aggregate + one
    // partitioned window over 2 rows per (user, day) — linear, and the
    // window partitions by day so no global sort. Ties order starts
    // before ends (delta DESC) in both engines, so a touch-point
    // interval counts as concurrent — the conservative convention
    // capacity planning wants.
    QueryDef.sql(
      "q270_peak_concurrency",
      """WITH iv AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |         min(ts) AS t0, max(ts) AS t1
        |  FROM events GROUP BY 1, 2),
        |pts AS (
        |  SELECT day, t0 AS t, 1 AS delta FROM iv
        |  UNION ALL
        |  SELECT day, t1 AS t, -1 AS delta FROM iv),
        |sw AS (
        |  SELECT day, t, delta,
        |         sum(delta) OVER (PARTITION BY day ORDER BY t, delta DESC
        |                          ROWS BETWEEN UNBOUNDED PRECEDING
        |                          AND CURRENT ROW) AS live
        |  FROM pts)
        |SELECT CAST(day AS BIGINT) AS day,
        |       CAST(max(live) AS BIGINT) AS peak_concurrent,
        |       CAST(count(*) / 2 AS BIGINT) AS n_users
        |FROM sw GROUP BY day ORDER BY day""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val iv = t(s, d, "events")
        .groupBy(col("user_id"),
          (unix_seconds(col("ts")) / 86400).cast("long").as("day"))
        .agg(min("ts").as("t0"), max("ts").as("t1"))
      val pts = iv.select(col("day"), col("t0").as("t"), lit(1).as("delta"))
        .unionByName(iv.select(col("day"), col("t1").as("t"),
          lit(-1).as("delta")))
      val w = Window.partitionBy("day").orderBy(col("t"), col("delta").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pts.withColumn("live", sum("delta").over(w))
        .groupBy("day")
        .agg(max("live").as("peak_concurrent"),
          (count(lit(1)) / 2).cast("long").as("n_users"))
        .orderBy("day")
    },

    // Top user-journey TRIGRAMS — the pathing report that generalizes
    // q254's Markov bigrams to 3-step sequences (which paths actually
    // dominate, not just which transitions): two lead() columns per user
    // partition concatenate the path key, one count aggregate, top-15
    // with lexicographic tie-break. At scale the distinct-path domain is
    // |types|³ = 125, so the rollup after the window pass is constant-
    // size regardless of corpus; the share denominator is a 1-row
    // broadcast.
    QueryDef.sql(
      "q274_path_trigrams",
      """WITH tl AS (
        |  SELECT user_id, event_type,
        |         lead(event_type, 1) OVER w AS t2,
        |         lead(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |paths AS (
        |  SELECT event_type || '>' || t2 || '>' || t3 AS path
        |  FROM tl WHERE t2 IS NOT NULL AND t3 IS NOT NULL),
        |c AS (SELECT path, count(*) AS n FROM paths GROUP BY 1),
        |r AS (SELECT path, n,
        |             row_number() OVER (ORDER BY n DESC, path) AS rank
        |      FROM c)
        |SELECT CAST(rank AS BIGINT) AS rank, path, CAST(n AS BIGINT) AS n,
        |       round(n * 1.0 / (SELECT sum(n) FROM c), 6) AS share
        |FROM r WHERE rank <= 15 ORDER BY rank""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val c = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          lead("event_type", 1).over(w).as("t2"),
          lead("event_type", 2).over(w).as("t3"))
        .filter(col("t2").isNotNull && col("t3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // ranked AND summed for the share
      val tot = c.agg(sum("n").as("tot"))
      // ≤125 distinct paths: the ranking window over the aggregate is a
      // model-sized frame (the q254 rowW case), not a data-sized one
      val rw = Window.orderBy(col("n").desc, col("path"))
      c.withColumn("rank", row_number().over(rw))
        .filter(col("rank") <= 15)
        .crossJoin(broadcast(tot))
        .select(col("rank").cast("long").as("rank"), col("path"), col("n"),
          round(col("n") * 1.0 / col("tot"), 6).as("share"))
        .orderBy("rank")
    },

    // Stationary distribution of the q254 user-journey Markov chain —
    // the long-run event mix the transition dynamics imply, compared
    // against today's empirical mix (the gap IS the forecastable drift).
    // The chain is Laplace-smoothed (so it's irreducible and the power
    // iteration converges) and the iteration is EXACT-STATE: transition
    // probabilities quantize once to integer 1e-9 units via integer
    // division, the state vector lives in integer 1e-8 units, and each of
    // the 6 unrolled rounds is an integer matvec + integer renormalize —
    // both engines hold bit-identical state at every round boundary (the
    // q287 discipline), so no float accumulation can diverge. Scale
    // shape: the corpus reduces ONCE to the |types|² transition counts;
    // every subsequent frame is model-sized (≤|types|² rows).
    QueryDef.sql(
      "q309_markov_stationary",
      MarkovExprs.oracle) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ev = t(s, d, "events")
      val tm = ev
        .select(col("event_type").as("f"),
          lead("event_type", 1).over(w).as("t2"))
        .filter(col("t2").isNotNull)
        .groupBy("f", "t2").agg(count(lit(1)).as("c"))
      val ty = ev.select(col("event_type").as("st")).distinct()
        .localCheckpoint(true) // |types| rows; grid + k read it
      val kk = ty.agg(count(lit(1)).as("k"))
      val grid = ty.select(col("st").as("f"))
        .crossJoin(broadcast(ty.select(col("st").as("t2"))))
      val cm = grid.join(tm, Seq("f", "t2"), "left")
        .select(col("f"), col("t2"), coalesce(col("c"), lit(0L)).as("c"))
      val rn = cm.groupBy("f").agg(sum("c").as("rn"))
        .localCheckpoint(true) // |types| rows; matrix + empirical read it
      // |types|² quantized matrix = bounded MODEL state (corpus-
      // independent — the type domain doesn't grow with rows), so the 6
      // integer matvec rounds run on the driver (the KMeans-centroid /
      // union-find discipline): Long ops are the SAME truncating integer
      // arithmetic both engines use, integer addition is order-free, and
      // the 6 chained tiny-frame shuffles this replaces were pure
      // scheduler overhead (measured 5.0 s → ~1.5 s at sf0.1).
      val m = cm.join(rn, "f").crossJoin(broadcast(kk))
        .selectExpr("f", "t2", "(c + 1) * 1000000000 div (rn + k) AS p9")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val types = m.map(_._1).distinct.sorted
      var v: Map[String, Long] =
        types.map(_ -> 100000000L / types.length).toMap
      for (_ <- 1 to MarkovExprs.rounds) {
        val wv = types.map { j =>
          j -> m.iterator.filter(_._2 == j)
            .map { case (i, _, p9) => v(i) * p9 }.sum
        }.toMap
        val tw = wv.valuesIterator.sum
        v = wv.map { case (j, x) => j -> x / (tw / 100000000L) }
      }
      val vDf = broadcast(s.createDataFrame(
        types.map(st => (st, v(st)))).toDF("st", "v"))
      val tot = rn.agg(sum("rn").as("tot"))
      rn.join(vDf, col("f") === col("st")).crossJoin(broadcast(tot))
        .selectExpr("st AS event_type",
          "round(CAST(v AS DOUBLE) / 1e8, 6) AS stationary_p",
          "round(CAST(rn AS DOUBLE) / tot, 6) AS empirical_p",
          "round(CAST(v AS DOUBLE) / 1e8 - CAST(rn AS DOUBLE) / tot, 6)" +
            " AS delta")
        .orderBy("event_type")
    }
  )

  private val attributionDefs: Seq[QueryDef] = Seq(

    // Markov removal-effect attribution (Anderl et al. 2014): model each
    // user's pre-first-purchase journey as a first-order chain
    // START→channels→{CONV,NULL}, then re-run absorption with each
    // channel REMOVED (its inbound probability redirected to NULL) — the
    // drop in 20-step conversion mass is that channel's credit, the
    // causal-flavored alternative to last-touch that q315's Shapley
    // cross-checks. The absorption run is EXACT-STATE (q287/q309
    // discipline): probabilities quantize once to integer 1e-9 units via
    // truncating integer division, the state vector lives in integer
    // 1e-8 units, and all (|channels|+1) scenarios iterate TOGETHER as
    // one (scenario, state) frame — 20 integer matvec rounds, bit-
    // identical in both engines, every frame model-sized after the
    // one-pass journey reduce.
    QueryDef.sql(
      "q314_markov_attribution",
      Markov2Exprs.oracle) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val rne = ev.select(col("user_id"), col("event_type"),
          row_number().over(w).as("rn"))
        .localCheckpoint(true) // skinny; first-purchase + journey scans
      val fp = rne.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("rn").as("frn"))
        .localCheckpoint(true)
      val jny = rne.join(fp, Seq("user_id"), "left")
        .filter(col("event_type") =!= "purchase" &&
          (col("frn").isNull || col("rn") < col("frn")))
        .select(col("user_id"), col("event_type").as("c"), col("rn"),
          when(col("frn").isNotNull, 1).otherwise(0).as("conv"))
      val wj = Window.partitionBy("user_id").orderBy("rn")
      val tl = jny.select(col("user_id"), col("c"), col("conv"),
          lead("c", 1).over(wj).as("nxt"),
          row_number().over(wj).as("j"))
        .localCheckpoint(true) // skinny; three edge projections
      val edges = tl.filter(col("j") === 1)
        .select(lit("START").as("f"), col("c").as("t2"))
        .unionByName(tl.filter(col("nxt").isNotNull)
          .select(col("c").as("f"), col("nxt").as("t2")))
        .unionByName(tl.filter(col("nxt").isNull)
          .select(col("c").as("f"),
            when(col("conv") === 1, "CONV").otherwise("NULL").as("t2")))
        .unionByName(fp.join(tl.select("user_id").distinct(),
            Seq("user_id"), "left_anti")
          .select(lit("START").as("f"), lit("CONV").as("t2")))
      val tr = edges.groupBy("f", "t2").agg(count(lit(1)).as("n"))
      val rt = tr.groupBy("f").agg(sum("n").as("nf"))
      val pb = tr.join(rt, "f")
        .selectExpr("f", "t2", "n * 1000000000 div nf AS p9")
        .unionByName(s.sql(
          """SELECT 'CONV' AS f, 'CONV' AS t2, CAST(1000000000 AS BIGINT) AS p9
            |UNION ALL
            |SELECT 'NULL', 'NULL', CAST(1000000000 AS BIGINT)""".stripMargin))
      // The quantized |states|² matrix is bounded MODEL state (the state
      // domain is the type domain — corpus-independent), so the 20-round
      // absorption for all (|ch|+1) scenarios runs on the driver (the
      // q309 / KMeans-centroid / union-find discipline): Long ops are the
      // same truncating integer arithmetic both engines use and integer
      // accumulation is order-free, so the state is bit-identical to the
      // oracle's unrolled rounds — while the 20 per-scenario tiny-frame
      // shuffle stages this replaces were pure scheduler overhead
      // (measured 4.8 s → ~1.5 s at sf0.1).
      val pbRows = pb.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val channels = ev.filter(col("event_type") =!= "purchase")
        .select(col("event_type")).distinct()
        .collect().map(_.getString(0)).sorted
      val cb = absorb(pbRows, "none")
      val rows = channels.map(c => (c, absorb(pbRows, c), cb))
      val te = rows.map { case (_, cva, b) => b - cva }.sum
      s.createDataFrame(rows.toSeq.map { case (c, cva, b) => (c, cva, b, te) })
        .toDF("rc", "cva", "cb", "te")
        .filter(col("cb") > 0 && col("te") =!= 0)
        .select(col("rc").as("channel"),
          round(col("cb").cast("double") / 1e8, 6).as("base_conv_p"),
          round(col("cva").cast("double") / 1e8, 6).as("removed_conv_p"),
          round(lit(1.0) - col("cva").cast("double") / col("cb"), 6)
            .as("removal_effect"),
          round((col("cb") - col("cva")).cast("double") / col("te"), 6)
            .as("attribution_share"))
        .orderBy("channel")
    },

    // Shapley-value channel attribution: each non-purchase event type's
    // average marginal contribution to conversion over all touch-set
    // coalitions (v(S) = conversion rate of users whose pre-first-purchase
    // touch set is EXACTLY S; unobserved coalitions contribute v=0 — a
    // documented, deterministic convention) — the game-theoretic
    // alternative to last-touch that q314's Markov removal effect
    // cross-checks. Everything after the per-user touch-set reduce is
    // model-sized: 2^|channels| coalition masks, |channels|·2^(|ch|−1)
    // marginal terms. Bit positions come from a window-free rank
    // (smaller-than count over the channel dim); factorial weights join
    // from a literal 0!–8! table (universal constants); each weighted
    // marginal is floored to BIGINT 1e-10 units via ONE shared template
    // before the order-free sum.
    QueryDef.sql(
      "q315_shapley",
      s"""WITH chd AS (SELECT DISTINCT event_type AS c FROM events
        |            WHERE event_type <> 'purchase'),
        |ch AS (SELECT a.c, CAST(count(b.c) AS BIGINT) AS b
        |       FROM chd a LEFT JOIN chd b ON b.c < a.c GROUP BY a.c),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ch),
        |rne AS (SELECT user_id, event_type,
        |               row_number() OVER (PARTITION BY user_id
        |                                  ORDER BY ts, event_id) AS rn
        |        FROM events),
        |fp AS (SELECT user_id, min(rn) AS frn FROM rne
        |       WHERE event_type = 'purchase' GROUP BY 1),
        |tu AS (SELECT r.user_id, r.event_type AS c
        |       FROM rne r LEFT JOIN fp ON r.user_id = fp.user_id
        |       WHERE r.event_type <> 'purchase'
        |         AND (fp.frn IS NULL OR r.rn < fp.frn)),
        |ub AS (SELECT DISTINCT t.user_id, ch.b FROM tu t JOIN ch ON t.c = ch.c),
        |uma AS (SELECT user_id, CAST(sum(1 << b) AS BIGINT) AS mask
        |        FROM ub GROUP BY 1),
        |uu AS (SELECT DISTINCT user_id FROM events),
        |mk AS (SELECT uu.user_id, coalesce(uma.mask, 0) AS mask,
        |              CASE WHEN fp.user_id IS NULL THEN 0 ELSE 1 END AS conv
        |       FROM uu LEFT JOIN uma ON uu.user_id = uma.user_id
        |               LEFT JOIN fp ON uu.user_id = fp.user_id),
        |vt AS (SELECT mask, CAST(count(*) AS BIGINT) AS nu,
        |              CAST(sum(conv) AS BIGINT) AS nc
        |       FROM mk GROUP BY 1),
        |univ AS (SELECT CAST(unnest(generate_series(0, (1 << n) - 1))
        |                     AS BIGINT) AS mask FROM nn),
        |vv AS (SELECT u.mask,
        |              CASE WHEN vt.nu IS NULL THEN CAST(0.0 AS DOUBLE)
        |                   ELSE ${ShapleyExprs.v} END AS v
        |       FROM univ u LEFT JOIN vt ON u.mask = vt.mask),
        |fct AS (SELECT * FROM (VALUES (0, 1), (1, 1), (2, 2), (3, 6),
        |                (4, 24), (5, 120), (6, 720), (7, 5040), (8, 40320))
        |                f(k, f)),
        |terms AS (SELECT ch.c,
        |                 ${ShapleyExprs.term} AS t10
        |          FROM ch CROSS JOIN nn
        |               JOIN vv s0 ON (s0.mask >> ch.b) & 1 = 0
        |               JOIN vv s1 ON s1.mask = s0.mask + (1 << ch.b)
        |               JOIN fct fs ON fs.k = bit_count(s0.mask)
        |               JOIN fct fn ON fn.k = n - 1 - bit_count(s0.mask)),
        |sh AS (SELECT c, CAST(sum(t10) AS BIGINT) AS s10
        |       FROM terms GROUP BY 1),
        |tch AS (SELECT ch.c, CAST(count(*) AS BIGINT) AS n_touched,
        |               CAST(sum(mk.conv) AS BIGINT) AS n_conv
        |        FROM mk JOIN ch ON (mk.mask >> ch.b) & 1 = 1
        |        GROUP BY ch.c),
        |fnn AS (SELECT CASE WHEN f.f IS NULL THEN CAST(error(
        |                 'q315_shapley: channel count exceeds factorial table (max 8)')
        |                 AS BIGINT) ELSE CAST(f.f AS BIGINT) END AS nf
        |        FROM nn LEFT JOIN fct f ON f.k = nn.n)
        |SELECT sh.c AS channel, tch.n_touched,
        |       round(CAST(tch.n_conv AS DOUBLE) / tch.n_touched, 6)
        |         AS conv_rate_touched,
        |       round(CAST(sh.s10 AS DOUBLE) / 1e10 / fnn.nf, 6) AS shapley
        |FROM sh JOIN tch ON sh.c = tch.c CROSS JOIN fnn
        |ORDER BY channel""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
      val chd = ev.filter(col("event_type") =!= "purchase")
        .select(col("event_type").as("c")).distinct()
        .localCheckpoint(true) // ≤|types| rows; self-joined for bit ranks
      val ch = chd.as("a")
        .join(broadcast(chd.as("b")), col("b.c") < col("a.c"), "left")
        .groupBy(col("a.c").as("c")).agg(count(col("b.c")).as("b"))
        .localCheckpoint(true) // bit table; joined from 3 places
      val nn = ch.agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val rne = ev.select(col("user_id"), col("event_type"),
          row_number().over(w).as("rn"))
        .localCheckpoint(true) // skinny; feeds first-purchase AND touches
      val fp = rne.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("rn").as("frn"))
        .localCheckpoint(true) // ≤|users| rows; read 2×
      val tu = rne.join(fp, Seq("user_id"), "left")
        .filter(col("event_type") =!= "purchase" &&
          (col("frn").isNull || col("rn") < col("frn")))
        .select(col("user_id"), col("event_type").as("c"))
      val ub = tu.join(broadcast(ch), "c")
        .select(col("user_id"), col("b")).distinct()
      val uma = ub.groupBy("user_id")
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"))
          .as("mask"))
      val uu = ev.select("user_id").distinct()
      val mk = uu.join(uma, Seq("user_id"), "left")
        .join(fp.select(col("user_id"), lit(1).as("cv")),
          Seq("user_id"), "left")
        .select(col("user_id"), coalesce(col("mask"), lit(0L)).as("mask"),
          coalesce(col("cv"), lit(0)).as("conv"))
        .localCheckpoint(true) // ≤|users| rows; coalition agg + touch agg
      val vt = mk.groupBy("mask").agg(count(lit(1)).as("nu"),
        sum("conv").as("nc"))
      val univ = nn.select(explode(sequence(lit(0L),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(n AS INT)) - 1"))).as("mask"))
      val vv = univ.join(vt, Seq("mask"), "left")
        .selectExpr("mask",
          s"CASE WHEN nu IS NULL THEN CAST(0.0 AS DOUBLE) " +
            s"ELSE ${ShapleyExprs.v} END AS v")
        .localCheckpoint(true) // 2^|ch| rows; joined as s0 AND s1
      val fct = s.createDataFrame(Seq((0, 1), (1, 1), (2, 2), (3, 6),
        (4, 24), (5, 120), (6, 720), (7, 5040), (8, 40320))).toDF("k", "f")
      val terms = ch.crossJoin(broadcast(nn))
        .join(broadcast(vv.selectExpr("mask AS m0", "v AS v0")),
          expr("(m0 >> CAST(b AS INT)) & 1 = 0"))
        .join(broadcast(vv.selectExpr("mask AS m1", "v AS v1")),
          expr("m1 = m0 + shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"))
        .join(broadcast(fct.selectExpr("k AS k0", "f AS fs")),
          expr("k0 = bit_count(m0)"))
        .join(broadcast(fct.selectExpr("k AS k1", "f AS fn")),
          expr("k1 = n - 1 - bit_count(m0)"))
        .selectExpr("c", s"${ShapleyExprs.sparkTerm} AS t10")
      val sh = terms.groupBy("c").agg(sum("t10").as("s10"))
      val tch = mk.join(broadcast(ch),
          expr("(mask >> CAST(b AS INT)) & 1 = 1"))
        .groupBy("c").agg(count(lit(1)).as("n_touched"),
          sum("conv").as("n_conv"))
      // Contract guard (round-10 ADVICE): the factorial table stops at 8!
      // and the 2^n coalition grid is only tractable for small n, so a
      // corpus with >8 non-purchase channels must fail LOUDLY in both
      // engines (error()/raise_error), not silently return zero rows off
      // an unmatched equi-join.
      val fnn = nn.join(broadcast(fct), col("k") === col("n"), "left")
        .selectExpr("CASE WHEN f IS NULL THEN CAST(raise_error(" +
          "'q315_shapley: channel count exceeds factorial table (max 8)')" +
          " AS BIGINT) ELSE CAST(f AS BIGINT) END AS nf")
      sh.join(tch, "c").crossJoin(broadcast(fnn))
        .select(col("c").as("channel"), col("n_touched"),
          round(col("n_conv").cast("double") / col("n_touched"), 6)
            .as("conv_rate_touched"),
          round(col("s10").cast("double") / 1e10 / col("nf"), 6)
            .as("shapley"))
        .orderBy("channel")
    },

    // Entropy rate of the q254 user-journey chain: per from-state the
    // next-step entropy H_i = −Σ_j p_ij·ln p_ij, and the overall rate
    // Σ_i w_i·H_i under the empirical from-state weights — the
    // predictability ceiling of user behavior (low rate ⇒ next-action
    // models can work; ln-uniform ⇒ don't bother). The rate reduces to
    // the single-sum identity −Σ_{ij} (n_ij/N)·ln(n_ij/n_i), so BOTH
    // readouts come from the same per-cell term family, each floored to
    // BIGINT 1e-10 units BEFORE summation (q143/q299/q308 discipline)
    // over the ≤|types|² observed-transition frame.
    QueryDef.sql(
      "q323_entropy_rate",
      s"""WITH tl AS (SELECT event_type AS f,
        |                  lead(event_type) OVER (PARTITION BY user_id
        |                                         ORDER BY ts, event_id)
        |                    AS t2
        |           FROM events),
        |tr AS (SELECT f, t2, CAST(count(*) AS BIGINT) AS c
        |       FROM tl WHERE t2 IS NOT NULL GROUP BY 1, 2),
        |rt AS (SELECT f, CAST(sum(c) AS BIGINT) AS ni FROM tr GROUP BY 1),
        |nn AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM tr),
        |tm AS (SELECT tr.f, rt.ni,
        |              ${EntropyRateExprs.stateTerm} AS ts10,
        |              ${EntropyRateExprs.rateTerm} AS tr10
        |       FROM tr JOIN rt ON tr.f = rt.f CROSS JOIN nn),
        |st AS (SELECT f AS event_type, CAST(max(ni) AS BIGINT) AS n_trans,
        |              round(CAST(CAST(sum(ts10) AS BIGINT) AS DOUBLE)
        |                    / 1e10, 6) AS entropy_nats
        |       FROM tm GROUP BY 1)
        |SELECT event_type, n_trans, entropy_nats FROM st
        |UNION ALL
        |SELECT 'ALL', (SELECT nt FROM nn),
        |       round(CAST(CAST(sum(tr10) AS BIGINT) AS DOUBLE) / 1e10, 6)
        |FROM tm
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tr = t(s, d, "events")
        .select(col("event_type").as("f"),
          lead("event_type", 1).over(w).as("t2"))
        .filter(col("t2").isNotNull)
        .groupBy("f", "t2").agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // ≤|types|² rows; totals + terms read it
      val rt = tr.groupBy("f").agg(sum("c").as("ni"))
      val nn = tr.agg(sum("c").as("nt"))
      val tm = tr.join(rt, "f").crossJoin(broadcast(nn))
        .selectExpr("f", "ni",
          s"${EntropyRateExprs.stateTerm} AS ts10",
          s"${EntropyRateExprs.rateTerm} AS tr10")
        .localCheckpoint(true) // ≤|types|² rows; per-state + rate rows
      val st = tm.groupBy(col("f").as("event_type"))
        .agg(max("ni").as("n_trans"), sum("ts10").as("s10"))
        .selectExpr("event_type", "CAST(n_trans AS BIGINT) AS n_trans",
          "round(CAST(CAST(s10 AS BIGINT) AS DOUBLE) / 1e10, 6)" +
            " AS entropy_nats")
      val all = tm.crossJoin(broadcast(nn.select(col("nt"))))
        .groupBy("nt").agg(sum("tr10").as("s10"))
        .selectExpr("'ALL' AS event_type", "nt AS n_trans",
          "round(CAST(CAST(s10 AS BIGINT) AS DOUBLE) / 1e10, 6)" +
            " AS entropy_nats")
      st.unionByName(all).orderBy("event_type")
    }
  )

  /** q323's entropy terms — ONE textual core parsed by both engines
    * (the InfoGainExprs discipline). Columns: `c` cell count, `ni`
    * from-state total, `nt` grand total. */
  private object EntropyRateExprs {
    val stateTerm: String =
      "CAST(floor(-(CAST(c AS DOUBLE) / ni) * ln(CAST(c AS DOUBLE) / ni) " +
        "* 1e10) AS BIGINT)"
    val rateTerm: String =
      "CAST(floor(-(CAST(c AS DOUBLE) / nt) * ln(CAST(c AS DOUBLE) / ni) " +
        "* 1e10) AS BIGINT)"
  }

  /** q314's exact-state absorption core, on a quantized (from, to, p9)
    * matrix in integer 1e-9 units: redirect the removed channel's inbound
    * mass to NULL, drop its rows, and run `Markov2Exprs.rounds` integer
    * matvec rounds from 1e-8 mass at START. Returns the CONV mass —
    * bit-identical to the oracle's unrolled rounds (same truncating
    * division, order-free integer accumulation). Public for
    * AttributionSpec. */
  def absorb(pbRows: Array[(String, String, Long)], rc: String): Long = {
    val mm = pbRows.iterator.filter(_._1 != rc)
      .map { case (f, t2, p9) =>
        ((f, if (rc != "none" && t2 == rc) "NULL" else t2), p9)
      }.toSeq.groupMapReduce(_._1)(_._2)(_ + _)
    var a: Map[String, Long] = Map("START" -> 100000000L)
    for (_ <- 1 to Markov2Exprs.rounds) {
      val nxt = scala.collection.mutable.Map.empty[String, Long]
      mm.foreach { case ((f, t2), p9) =>
        a.get(f).foreach(v => nxt(t2) = nxt.getOrElse(t2, 0L) + v * p9)
      }
      a = nxt.view.mapValues(_ / 1000000000L).toMap
    }
    a.getOrElse("CONV", 0L)
  }

  /** q314's oracle: journey→edges→quantized matrix→20 integer absorption
    * rounds over the (scenario, state) frame, unrolled from ONE round
    * template (the MarkovExprs discipline) so the Spark loop and the SQL
    * stay move-for-move identical. */
  private object Markov2Exprs {
    val rounds = 20
    private def round(r: Int): String =
      s"""a$r AS MATERIALIZED (SELECT a.rc, m.t2 AS st,
         |        CAST(sum(a.v * m.p9) // 1000000000 AS BIGINT) AS v
         |        FROM a${r - 1} a JOIN mm m ON a.rc = m.rc AND a.st = m.f
         |        GROUP BY 1, 2)""".stripMargin
    val oracle: String =
      s"""WITH rne AS MATERIALIZED (SELECT user_id, event_type,
         |             row_number() OVER (PARTITION BY user_id
         |                                ORDER BY ts, event_id) AS rn
         |      FROM events),
         |fp AS MATERIALIZED (SELECT user_id, min(rn) AS frn FROM rne
         |       WHERE event_type = 'purchase' GROUP BY 1),
         |jny AS MATERIALIZED (SELECT r.user_id, r.event_type AS c, r.rn,
         |               CASE WHEN fp.frn IS NULL THEN 0 ELSE 1 END AS conv
         |        FROM rne r LEFT JOIN fp ON r.user_id = fp.user_id
         |        WHERE r.event_type <> 'purchase'
         |          AND (fp.frn IS NULL OR r.rn < fp.frn)),
         |tl AS MATERIALIZED (SELECT user_id, c, conv,
         |              lead(c) OVER (PARTITION BY user_id ORDER BY rn)
         |                AS nxt,
         |              row_number() OVER (PARTITION BY user_id ORDER BY rn)
         |                AS j
         |       FROM jny),
         |ed AS MATERIALIZED (SELECT 'START' AS f, c AS t2 FROM tl WHERE j = 1
         |       UNION ALL SELECT c, nxt FROM tl WHERE nxt IS NOT NULL
         |       UNION ALL
         |       SELECT c, CASE WHEN conv = 1 THEN 'CONV' ELSE 'NULL' END
         |       FROM tl WHERE nxt IS NULL
         |       UNION ALL
         |       SELECT 'START', 'CONV' FROM fp
         |       WHERE user_id NOT IN (SELECT user_id FROM tl)),
         |tr AS MATERIALIZED (SELECT f, t2, CAST(count(*) AS BIGINT) AS n
         |       FROM ed GROUP BY 1, 2),
         |rt AS MATERIALIZED (SELECT f, CAST(sum(n) AS BIGINT) AS nf FROM tr GROUP BY 1),
         |pb AS MATERIALIZED (SELECT tr.f, tr.t2, tr.n * 1000000000 // rt.nf AS p9
         |       FROM tr JOIN rt ON tr.f = rt.f
         |       UNION ALL
         |       SELECT 'CONV', 'CONV', CAST(1000000000 AS BIGINT)
         |       UNION ALL
         |       SELECT 'NULL', 'NULL', CAST(1000000000 AS BIGINT)),
         |rcd AS MATERIALIZED (SELECT DISTINCT event_type AS rc FROM events
         |        WHERE event_type <> 'purchase'
         |        UNION ALL SELECT 'none'),
         |mm AS MATERIALIZED (SELECT rc, f, t2, CAST(sum(p9) AS BIGINT) AS p9
         |       FROM (SELECT r.rc, p.f,
         |                    CASE WHEN r.rc <> 'none' AND p.t2 = r.rc
         |                         THEN 'NULL' ELSE p.t2 END AS t2, p.p9
         |             FROM rcd r CROSS JOIN pb p WHERE p.f <> r.rc)
         |       GROUP BY 1, 2, 3),
         |a0 AS MATERIALIZED (SELECT rc, 'START' AS st, CAST(100000000 AS BIGINT) AS v
         |       FROM rcd),
         |${(1 to rounds).map(round).mkString(",\n")},
         |cv AS MATERIALIZED (SELECT rc,
         |              CAST(coalesce(max(CASE WHEN st = 'CONV' THEN v END),
         |                            0) AS BIGINT) AS cva
         |       FROM a$rounds GROUP BY rc),
         |res AS MATERIALIZED (SELECT cv.rc, cv.cva, b.cb
         |        FROM cv CROSS JOIN (SELECT cva AS cb FROM cv
         |                            WHERE rc = 'none') b
         |        WHERE cv.rc <> 'none'),
         |tot AS MATERIALIZED (SELECT CAST(sum(cb - cva) AS BIGINT) AS te FROM res)
         |SELECT res.rc AS channel,
         |       round(CAST(cb AS DOUBLE) / 1e8, 6) AS base_conv_p,
         |       round(CAST(cva AS DOUBLE) / 1e8, 6) AS removed_conv_p,
         |       round(1.0 - CAST(cva AS DOUBLE) / cb, 6) AS removal_effect,
         |       round(CAST(cb - cva AS DOUBLE) / te, 6) AS attribution_share
         |FROM res CROSS JOIN tot WHERE cb > 0 AND te <> 0
         |ORDER BY channel""".stripMargin
  }

  /** q315's value and marginal-term algebra — ONE textual core so the
    * double op order is identical in both engines; the Spark rendering
    * only renames the coalition columns (s0/s1 CTE aliases vs m0/v0/m1/v1
    * flattened columns). */
  private object ShapleyExprs {
    val v: String = "(CAST(nc AS DOUBLE) / nu)"
    val term: String =
      "CAST(floor(CAST(fs.f * fn.f AS DOUBLE) * (s1.v - s0.v) * 1e10) " +
        "AS BIGINT)"
    val sparkTerm: String =
      "CAST(floor(CAST(fs * fn AS DOUBLE) * (v1 - v0) * 1e10) AS BIGINT)"
  }

  /** q309's oracle: the same integer-state power iteration unrolled as a
    * CTE chain, generated from ONE round template so the Spark loop and
    * the SQL stay move-for-move identical. */
  private object MarkovExprs {
    val rounds = 6
    private def round(r: Int): String = {
      val pv = if (r == 1) "v0" else s"v${r - 1}"
      s"""w$r AS (SELECT m.t2 AS st, CAST(sum($pv.v * m.p9) AS BIGINT) AS w
         |        FROM $pv JOIN m ON $pv.st = m.f GROUP BY 1),
         |x$r AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w$r),
         |v$r AS (SELECT st, w // (tw // 100000000) AS v
         |        FROM w$r CROSS JOIN x$r)""".stripMargin
    }
    val oracle: String =
      s"""WITH tl AS (
         |  SELECT event_type AS f,
         |         lead(event_type) OVER (PARTITION BY user_id
         |                                ORDER BY ts, event_id) AS t2
         |  FROM events),
         |tm AS (SELECT f, t2, CAST(count(*) AS BIGINT) AS c
         |       FROM tl WHERE t2 IS NOT NULL GROUP BY 1, 2),
         |ty AS (SELECT DISTINCT event_type AS st FROM events),
         |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ty),
         |grid AS (SELECT a.st AS f, b.st AS t2 FROM ty a CROSS JOIN ty b),
         |cm AS (SELECT g.f, g.t2, coalesce(tm.c, 0) AS c
         |       FROM grid g LEFT JOIN tm ON g.f = tm.f AND g.t2 = tm.t2),
         |rn AS (SELECT f, CAST(sum(c) AS BIGINT) AS rn FROM cm GROUP BY 1),
         |m AS (SELECT cm.f, cm.t2,
         |             (cm.c + 1) * 1000000000 // (rn.rn + kk.k) AS p9
         |      FROM cm JOIN rn ON cm.f = rn.f CROSS JOIN kk),
         |v0 AS (SELECT st, 100000000 // k AS v FROM ty CROSS JOIN kk),
         |${(1 to rounds).map(round).mkString(",\n")},
         |tot AS (SELECT CAST(sum(rn) AS BIGINT) AS tot FROM rn)
         |SELECT v$rounds.st AS event_type,
         |       round(CAST(v$rounds.v AS DOUBLE) / 1e8, 6) AS stationary_p,
         |       round(CAST(rn.rn AS DOUBLE) / tot.tot, 6) AS empirical_p,
         |       round(CAST(v$rounds.v AS DOUBLE) / 1e8
         |             - CAST(rn.rn AS DOUBLE) / tot.tot, 6) AS delta
         |FROM v$rounds JOIN rn ON v$rounds.st = rn.f CROSS JOIN tot
         |ORDER BY event_type""".stripMargin
  }
}
