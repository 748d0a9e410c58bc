package graft

import org.apache.spark.sql.types._

/** Fixed, declared schemas — the engine's single source of truth, playing the
  * role the Glue table plays in the reference
  * (/root/reference/cdk_datalake_mvp/cdk_datalake_mvp_stack.py:347-511).
  *
  * Schema discipline follows the reference (SURVEY.md §1.5): the hot path binds
  * to pre-declared schemas (never `inferSchema`), JSON parse is case-exact, and
  * the analytic schema is flat — `int`/`double`/`string` only.
  */
object Schemas {

  /** Firehose-style record envelope (hello.py:64-66): an opaque id plus a
    * base64 payload. */
  val envelope: StructType = StructType(Seq(
    StructField("recordId", StringType, nullable = false),
    StructField("data", StringType, nullable = false)))

  /** SOH header after first base64+JSON decode (hello.py:140-145;
    * stack.py:393-400 for the pass-through `len`/`status`). The nested `data`
    * is base64 of [[sohInner]]. */
  val sohHeader: StructType = StructType(Seq(
    StructField("packetId", IntegerType),
    StructField("deviceType", IntegerType),
    StructField("deviceId", IntegerType),
    StructField("userApplicationId", IntegerType),
    StructField("organizationId", IntegerType),
    StructField("len", IntegerType),
    StructField("status", IntegerType),
    StructField("hiveRxTime", StringType),
    StructField("data", StringType)))

  /** SOH inner telemetry JSON, short keys (hello.py:146-167). */
  val sohInner: StructType = StructType(Seq(
    StructField("ln", DoubleType),   // longitude
    StructField("lt", DoubleType),   // latitude
    StructField("si", DoubleType),   // solar_panel_current
    StructField("bi", DoubleType),   // battery_current
    StructField("sv", DoubleType),   // solar_panel_voltage
    StructField("bv", DoubleType),   // battery_voltage
    StructField("d", IntegerType),   // date_time (epoch seconds)
    StructField("n", IntegerType),   // no_messages_sent_since_last_power_cycle
    StructField("a", DoubleType),    // altitude
    StructField("s", DoubleType),    // speed
    StructField("c", DoubleType),    // course
    StructField("r", IntegerType),   // last_rssi_value
    StructField("ti", DoubleType)))  // modem_current

  /** The 30-column analytic `stage` table (stack.py:372-493; SURVEY.md §1.4).
    * Column order matches the Glue declaration. */
  val stage30: StructType = StructType(Seq(
    StructField("packetid", IntegerType),
    StructField("devicetype", IntegerType),
    StructField("deviceid", IntegerType),
    StructField("userapplicationid", IntegerType),
    StructField("organizationid", IntegerType),
    StructField("len", IntegerType),
    StructField("status", IntegerType),
    StructField("hiverxtime", StringType),
    StructField("longitude", DoubleType),
    StructField("latitude", DoubleType),
    StructField("addressnumber", StringType),
    StructField("street", StringType),
    StructField("municipality", StringType),
    StructField("region", StringType),
    StructField("subregion", StringType),
    StructField("postalcode", StringType),
    StructField("country", StringType),
    StructField("timezone_name", StringType),
    StructField("timezone_offset", IntegerType),
    StructField("solar_panel_current", DoubleType),
    StructField("battery_current", DoubleType),
    StructField("solar_panel_voltage", DoubleType),
    StructField("battery_voltage", DoubleType),
    StructField("date_time", IntegerType),
    StructField("no_messages_sent_since_last_power_cycle", IntegerType),
    StructField("altitude", DoubleType),
    StructField("speed", DoubleType),
    StructField("course", DoubleType),
    StructField("last_rssi_value", IntegerType),
    StructField("modem_current", DoubleType)))

  /** Geo-enrichment dimension (replaces Amazon Location PlaceIndex,
    * hello.py:28-45; FIXTURES.md §6). `gh` is a geohash-prefix join key. */
  val geoDim: StructType = StructType(Seq(
    StructField("gh", StringType, nullable = false),
    StructField("addressnumber", StringType),
    StructField("street", StringType),
    StructField("municipality", StringType),
    StructField("region", StringType),
    StructField("subregion", StringType),
    StructField("postalcode", StringType),
    StructField("country", StringType),
    StructField("timezone_name", StringType),
    StructField("timezone_offset", IntegerType)))
}
