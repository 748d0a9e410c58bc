package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vessel-track analytics — the Athena-side queries a user of the reference
  * data lake runs over decoded NMEA positions (per-device ping sequences):
  * haversine leg distances, per-device track length and longest leg.
  * Positions are the per-device latitude/longitude the reference's
  * transform emits on every record (hello.py:82-96 NMEA $PIMD8 parse,
  * hello.py:146-147 SOH `ln`/`lt` promotion) — this module is the
  * downstream analytics those columns exist FOR.
  *
  * The synthetic tables carry no moving positions, so pings are derived
  * deterministically from `events` columns (device = user_id, ping time =
  * ts, lat/lon = integer-modulo grids plus an event_id-keyed offset) — the
  * same fixture discipline as IngestParity's envelope corpus: both engines
  * derive identical doubles from identical integers.
  *
  * Float discipline for the transcendentals: the haversine is ONE
  * textually-identical expression in both engines (radians/sin/cos/asin/
  * sqrt), each leg is rounded at 6dp BEFORE aggregation (libm vs JVM Math
  * may differ in the last ulp), and the final sums round at 3dp — the
  * q87/q124/q130 precedent.
  *
  * 100 TB shape: one lag window per device partition (devices are the
  * natural parallel unit of a tracking corpus), then a partial+final
  * aggregate; no join anywhere.
  */
object TrackQueries {

  /** The shared ping fixture — ONE derivation for q135 and q137, in both
    * engines (a tweak applied to one query but not the other would
    * silently fork the "same" track data). */
  private val pingsSql =
    """pings AS (
      |  SELECT user_id AS device_id, ts, event_id,
      |         (user_id % 120) - 60 + (event_id % 100) * 0.01 AS lat,
      |         (user_id % 360) - 180 + (event_id % 200) * 0.01 AS lon
      |  FROM events)""".stripMargin
  private val pingLat: org.apache.spark.sql.Column =
    (col("user_id") % 120) - 60 + (col("event_id") % 100) * 0.01
  private val pingLon: org.apache.spark.sql.Column =
    (col("user_id") % 360) - 180 + (col("event_id") % 200) * 0.01

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q135_track_summary",
      s"""WITH $pingsSql,
        |legs AS (
        |  SELECT device_id, lat, lon,
        |         lag(lat) OVER w AS plat,
        |         lag(lon) OVER w AS plon
        |  FROM pings
        |  WINDOW w AS (PARTITION BY device_id ORDER BY ts, event_id)),
        |d AS (
        |  SELECT device_id,
        |         round(2 * 6371.0088 * asin(sqrt(
        |           sin(radians(lat - plat) / 2) * sin(radians(lat - plat) / 2)
        |           + cos(radians(plat)) * cos(radians(lat))
        |             * sin(radians(lon - plon) / 2) * sin(radians(lon - plon) / 2)
        |         )), 6) AS leg_km
        |  FROM legs)
        |SELECT device_id,
        |       CAST(count(*) AS BIGINT) AS n_pings,
        |       CAST(round(sum(CAST(leg_km AS DECIMAL(28,6))), 3) AS DOUBLE)
        |         AS total_km,
        |       round(max(leg_km), 3) AS max_leg_km
        |FROM d
        |GROUP BY device_id
        |HAVING count(*) >= 2
        |ORDER BY device_id""".stripMargin) { (s, d) =>
      val pings = t(s, d, "events")
        .select(col("user_id").as("device_id"), col("ts"), col("event_id"),
          pingLat.as("lat"), pingLon.as("lon"))
      val w = Window.partitionBy("device_id").orderBy("ts", "event_id")
      val legs = pings
        .withColumn("plat", lag("lat", 1).over(w))
        .withColumn("plon", lag("lon", 1).over(w))
      val dLat2 = radians(col("lat") - col("plat")) / 2
      val dLon2 = radians(col("lon") - col("plon")) / 2
      val legKm = round(
        lit(2 * 6371.0088) * asin(sqrt(
          sin(dLat2) * sin(dLat2)
            + cos(radians(col("plat"))) * cos(radians(col("lat")))
            * sin(dLon2) * sin(dLon2))), 6)
      // 6dp leg values sum EXACTLY as DECIMAL(28,6) — a double sum is
      // order-dependent, and at sf1 one device's total landed on a .0005
      // half-point where the two engines' accumulation orders rounded
      // apart (round-11 full-surface sf1 sweep finding).
      legs.select(col("device_id"), legKm.as("leg_km"))
        .groupBy("device_id")
        .agg(count(lit(1)).as("n_pings"),
          round(sum(col("leg_km").cast(
            org.apache.spark.sql.types.DecimalType(28, 6))), 3)
            .cast("double").as("total_km"),
          round(max("leg_km"), 3).as("max_leg_km"))
        .filter(col("n_pings") >= 2)
        .orderBy("device_id")
    },

    // Geofence dwell accounting: time inside a lat/lon box per device —
    // dwell seconds (consecutive-ping deltas where BOTH ends are inside,
    // the standard conservative convention), ping counts, and
    // outside→inside entry transitions. Every quantity is exact integer
    // arithmetic (epoch seconds, flags) — no float discipline needed at
    // all. Same lag-window-per-device shape as q135 — including the
    // (es, event_id) EVENT-ORDER tie-break: second-truncated timestamps
    // collide routinely, and ordering by anything else (e.g. the inside
    // flag) would mis-sequence same-second pings and fabricate phantom
    // transitions. No join.
    QueryDef.sql(
      "q137_geofence_dwell",
      s"""WITH $pingsSql,
        |flagged AS (
        |  SELECT device_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, event_id,
        |         CASE WHEN lat BETWEEN -60 AND 30.5 AND lon BETWEEN -180 AND 60
        |              THEN 1 ELSE 0 END AS inside
        |  FROM pings),
        |lagged AS (
        |  SELECT device_id, es, inside,
        |         lag(es) OVER w AS pes,
        |         lag(inside) OVER w AS pinside
        |  FROM flagged
        |  WINDOW w AS (PARTITION BY device_id ORDER BY es, event_id))
        |SELECT device_id,
        |       CAST(sum(inside) AS BIGINT) AS n_inside,
        |       CAST(coalesce(sum(CASE WHEN inside = 1 AND pinside = 1
        |                          THEN es - pes ELSE 0 END), 0) AS BIGINT) AS dwell_seconds,
        |       CAST(coalesce(sum(CASE WHEN inside = 1 AND pinside = 0
        |                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_entries
        |FROM lagged
        |GROUP BY device_id
        |HAVING sum(inside) > 0
        |ORDER BY device_id""".stripMargin) { (s, d) =>
      val flagged = t(s, d, "events")
        .select(col("user_id").as("device_id"),
          col("ts").cast("long").as("es"), col("event_id"),
          when(pingLat.between(-60, 30.5) && pingLon.between(-180, 60), 1L)
            .otherwise(0L).as("inside"))
      val w = Window.partitionBy("device_id").orderBy("es", "event_id")
      val lagged = flagged
        .withColumn("pes", lag("es", 1).over(w))
        .withColumn("pinside", lag("inside", 1).over(w))
      lagged.groupBy("device_id")
        .agg(sum("inside").as("n_inside"),
          coalesce(sum(when(col("inside") === 1 && col("pinside") === 1,
            col("es") - col("pes")).otherwise(0L)), lit(0L)).as("dwell_seconds"),
          coalesce(sum(when(col("inside") === 1 && col("pinside") === 0, 1L)
            .otherwise(0L)), lit(0L)).as("n_entries"))
        .filter(col("n_inside") > 0)
        .orderBy("device_id")
    }
  )
}
