package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Schemas, SparkTestSession}

/** Golden tests for the ingest transform pipeline against the FIXTURES.md
  * payloads (reconstructed from hello.py's consuming code paths). */
class IngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  // FIXTURES.md §3 — SOH inner telemetry
  val sohInnerJson =
    """{"ln":-122.4194,"lt":37.7749,"si":0.42,"bi":-0.11,"sv":13.8,"bv":4.05,
      |"d":1678759166,"n":12,"a":16.0,"s":0.3,"c":184.2,"r":-91,"ti":0.07}"""
      .stripMargin.replace("\n", "")

  // FIXTURES.md §2 — SOH header envelope (data = single base64 of inner)
  def sohHeaderJson(inner: String) =
    s"""{"packetId":52804407,"deviceType":1,"deviceId":19561,
       |"userApplicationId":65002,"organizationId":10842,"len":173,"status":0,
       |"hiveRxTime":"2023-03-14T01:59:26Z","data":"${b64(inner)}"}"""
      .stripMargin.replace("\n", "")

  // FIXTURES.md §4 — NMEA sensor message (data = double base64 of sentence)
  val pimd8 = "$PIMD8,19561,1,866,65098,37.7749,N,122.4194,W,*4F"

  def envelope(rows: (String, String)*): DataFrame =
    rows.toSeq.toDF("recordId", "data")

  def sohRecord(id: String = "r-soh"): (String, String) =
    (id, b64(sohHeaderJson(sohInnerJson)))

  def sensorRecord(sentence: String, id: String = "r-sen"): (String, String) =
    (id, b64(sohHeaderJson("ignored").replace(b64("ignored"), b64(b64(sentence)))))

  // FIXTURES.md §6 — geo dim covering the SF fixture cell
  val places: DataFrame = Seq(
    (-122.4194, 37.7749, "410", "Townsend St", "San Francisco", "California",
      "San Francisco County", "94107", "USA", "America/Los_Angeles", -25200),
    (151.2093, -33.8688, "1", "Macquarie St", "Sydney", "NSW",
      "Sydney", "2000", "AUS", "Australia/Sydney", 36000)
  ).toDF("longitude", "latitude", "addressnumber", "street", "municipality",
    "region", "subregion", "postalcode", "country", "timezone_name",
    "timezone_offset")
  lazy val geo = GeoDim.fromPlaces(places)

  test("classifier routes soh / sensor / unknown / error (FIXTURES.md §2-4)") {
    val df = envelope(
      sohRecord(),
      sensorRecord(pimd8),
      sensorRecord("$PIMD9,whatever", "r-p9"),
      sensorRecord("$GPGGA,123519,4807.038,N", "r-unk"),
      ("r-bad", "not base64 at all!"))
    val got = IngestTransforms.classify(df)
      .select("recordId", "cls").as[(String, String)].collect().toMap
    assert(got == Map(
      "r-soh" -> "soh", "r-sen" -> "sensor", "r-p9" -> "sensor",
      "r-unk" -> "unknown", "r-bad" -> "error"))
  }

  test("sohToStage produces the 30-column stage schema + partition keys (§1.4, O15)") {
    val out = IngestTransforms.sohToStage(envelope(sohRecord()), geo)
    val expectedCols = "recordId" +: Schemas.stage30.fieldNames.toSeq :+ "year" :+ "month" :+ "day"
    assert(out.columns.toSeq == expectedCols)
    val row = out.collect().head
    def v(c: String) = row.get(out.columns.indexOf(c))
    assert(v("packetid") == 52804407)
    assert(v("deviceid") == 19561)
    assert(v("hiverxtime") == "2023-03-14T01:59:26Z")
    assert(v("longitude") == -122.4194)
    assert(v("latitude") == 37.7749)
    assert(v("battery_voltage") == 4.05)
    assert(v("date_time") == 1678759166)
    assert(v("last_rssi_value") == -91)
    assert(v("modem_current") == 0.07)
    // geo enrichment via broadcast grid join (J1/O13)
    assert(v("street") == "Townsend St")
    assert(v("timezone_offset") == -25200)
    assert(v("country") == "USA")
    // 1678759166 epoch = 2023-03-14 UTC, zero-padded (stack.py:233)
    assert((v("year"), v("month"), v("day")) == (("2023", "03", "14")))
  }

  test("NMEA hemisphere signs applied independently (O7-O9, fixes §2.8.1 quirk)") {
    val cases = Seq(
      ("ne", "$PIMD8,1,1,866,65098,37.7749,N,122.4194,E,*4F", 122.4194, 37.7749),
      ("se", "$PIMD8,1,1,866,65098,37.7749,S,122.4194,E,*4F", 122.4194, -37.7749),
      ("nw", "$PIMD8,1,1,866,65098,37.7749,N,122.4194,W,*4F", -122.4194, 37.7749),
      ("sw", "$PIMD8,1,1,866,65098,37.7749,S,122.4194,W,*4F", -122.4194, -37.7749))
    val df = envelope(cases.map(c => sensorRecord(c._2, c._1)): _*)
    val got = IngestTransforms.sensorPositions(df, geo)
      .select("recordId", "longitude", "latitude")
      .as[(String, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    cases.foreach { case (id, _, lon, lat) =>
      assert(got(id) == ((lon, lat)), s"case $id")
    }
  }

  test("$PIMD9 classifies as sensor but yields no parsed position (hello.py:79)") {
    val df = envelope(sensorRecord("$PIMD9,some,payload", "r-p9"))
    assert(IngestTransforms.classify(df).filter($"cls" === "sensor").count() == 1)
    assert(IngestTransforms.sensorPositions(df, geo).count() == 0)
  }

  test("alert predicates fire on voltage thresholds with non-alerting twins (O14)") {
    val inner = (sv: Double, bv: Double) =>
      sohInnerJson.replace("13.8", sv.toString).replace("4.05", bv.toString)
    val df = envelope(
      ("a-solar", b64(sohHeaderJson(inner(11.9, 4.5)))),
      ("a-batt", b64(sohHeaderJson(inner(13.0, 3.9)))),
      ("a-none", b64(sohHeaderJson(inner(12.0, 4.0)))))
    val stage = IngestTransforms.sohToStage(df, geo)
    val got = IngestTransforms.alerts(stage)
      .select("deviceid", "alert_type").collect()
    assert(got.length == 2)
    assert(got.map(_.getString(1)).sorted.toSeq ==
      Seq("low_battery_voltage", "low_solar_voltage"))
  }

  test("base64 shape test accepts canonical encodings and rejects others (O4)") {
    val samples = Seq("a", "ab", "hello world", "{\"k\":1}", "$PIMD8,x", "")
    val enc = samples.filter(_.nonEmpty).map(b64)
    val notB64 = Seq("not base64 at all!", "abc", "====", "a b c")
    val df = (enc.map(("enc", _)) ++ notB64.map(("raw", _))).toDF("kind", "s")
      .withColumn("is64", IngestTransforms.isCanonicalBase64($"s"))
    val byKind = df.groupBy("kind")
      .agg(sum(when($"is64", 1).otherwise(0)).as("n64"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byKind("enc")._1 == byKind("enc")._2, "all canonical encodings accepted")
    assert(byKind("raw")._1 == 0, "all non-base64 rejected")
  }

  test("partition keys zero-pad and respect year boundaries (O15)") {
    val df = Seq((0L, 1L), (1L, 946684799L), (2L, 946684800L))
      .toDF("id", "epoch")
    val got = IngestTransforms.withPartitionKeys(df, $"epoch")
      .orderBy("id").select("year", "month", "day")
      .as[(String, String, String)].collect().toSeq
    assert(got == Seq(
      ("1970", "01", "01"),
      ("1999", "12", "31"),
      ("2000", "01", "01")))
  }

  test("nearest-neighbor geo enrichment picks the closest place across cell borders (J1)") {
    // two places in adjacent cells; the record sits in place B's cell but
    // closer to no one else — and a second record sits in a cell with no
    // place but adjacent to A's cell
    val twoPlaces = Seq(
      (-122.30, 37.70, "1", "A St", "CityA", "RA", "SA", "11111", "USA", "TZ/A", -1),
      (-122.26, 37.76, "2", "B St", "CityB", "RB", "SB", "22222", "USA", "TZ/B", -2)
    ).toDF("longitude", "latitude", "addressnumber", "street", "municipality",
      "region", "subregion", "postalcode", "country", "timezone_name",
      "timezone_offset")
    // record at (-122.31, 37.71): same cell as A; nearest is A
    // record at (-122.24, 37.74): cell to the east of both; nearest is B
    val recs = Seq(
      ("r1", -122.31, 37.71),
      ("r2", -122.24, 37.74)).toDF("recordId", "longitude", "latitude")
    val got = IngestTransforms.geoEnrichNearest(recs, twoPlaces)
      .select("recordId", "street").as[(String, String)].collect().toMap
    assert(got == Map("r1" -> "A St", "r2" -> "B St"))
  }

  test("geo enrichment escalates past an empty 3x3 neighborhood to the bounded max ring (J1)") {
    // one isolated place; the record sits 4 grid cells east of it, so its
    // whole 3x3 neighborhood is empty (the reference's managed index would
    // still return this place — hello.py:28-45 always answers nearest)
    val onePlace = Seq(
      (-122.30, 37.70, "1", "A St", "CityA", "RA", "SA", "11111", "USA", "TZ/A", -1)
    ).toDF("longitude", "latitude", "addressnumber", "street", "municipality",
      "region", "subregion", "postalcode", "country", "timezone_name",
      "timezone_offset")
    val recs = Seq(("r1", -121.50, 37.70)).toDF("recordId", "longitude", "latitude")
    def street(maxR: Int) =
      IngestTransforms.geoEnrichNearest(recs, onePlace, maxRadiusCells = maxR,
        globalFallback = false)
        .select("street").as[Option[String]].collect().toSeq
    assert(street(1) == Seq(None), "bounded contract: empty 3x3 -> null")
    assert(street(3) == Seq(None), "ring 3 still short of the place")
    assert(street(4) == Seq(Some("A St")), "ring 4 reaches the isolated place")
  }

  test("geo enrichment always answers the global nearest by default (hello.py:28-45 parity)") {
    // the same isolated geometry, but under the DEFAULT contract: the
    // record is farther than maxRadiusCells from any place, yet still
    // enriches to the true nearest via the global-fallback pass — exactly
    // the managed index's MaxResults=1 always-nearest semantics. A second
    // place farther away pins that the fallback takes the arg-min, not an
    // arbitrary candidate.
    val places = Seq(
      (-122.30, 37.70, "1", "A St", "CityA", "RA", "SA", "11111", "USA", "TZ/A", -1),
      (-130.00, 45.00, "2", "B St", "CityB", "RB", "SB", "22222", "USA", "TZ/B", -2)
    ).toDF("longitude", "latitude", "addressnumber", "street", "municipality",
      "region", "subregion", "postalcode", "country", "timezone_name",
      "timezone_offset")
    val recs = Seq(("r1", -121.50, 37.70)).toDF("recordId", "longitude", "latitude")
    val got = IngestTransforms.geoEnrichNearest(recs, places)
      .select("street").as[Option[String]].collect().toSeq
    assert(got == Seq(Some("A St")),
      "beyond the max ring the fallback must still enrich to the true nearest")
    // and an EMPTY places dim must not lose records — null geo, like a
    // failed geocode
    val none = IngestTransforms.geoEnrichNearest(recs, places.limit(0))
      .select("street").as[Option[String]].collect().toSeq
    assert(none == Seq(None), "empty dim: record survives with null geo")
  }
}
