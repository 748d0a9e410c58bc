package graft.ingest

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property-based pins (SURVEY.md §5.2.2): encode∘decode identity, classifier
  * totality, sign-fix idempotence, partition-key round trip. Properties are
  * evaluated through Spark columns (one batched DataFrame per property), so
  * they exercise the actual engine expressions, not Scala re-implementations.
  */
class IngestPropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  test("base64 encode∘decode is the identity and always classifies canonical") {
    val strings = Gen.listOfN(60,
      Gen.nonEmptyListOf(Gen.asciiPrintableChar).map(_.mkString)).sample.get
    val df = strings.toDF("s")
      .withColumn("enc", base64(col("s").cast("binary")))
      .withColumn("dec", unbase64(col("enc")).cast("string"))
      .withColumn("canon", IngestTransforms.isCanonicalBase64(col("enc")))
    val bad = df.filter(col("dec") =!= col("s") || !col("canon")).count()
    assert(bad == 0)
  }

  test("classifier is total: every record gets exactly one known class") {
    val payloads = Gen.listOfN(80, Gen.oneOf(
      Gen.const(b64(s"""{"packetId":1,"deviceType":1,"deviceId":2,"userApplicationId":3,"organizationId":4,"len":5,"status":0,"hiveRxTime":"t","data":"${b64("{\"ln\":1.0}")}"}""")),
      Gen.const(b64(s"""{"packetId":1,"deviceType":1,"deviceId":2,"userApplicationId":3,"organizationId":4,"len":5,"status":0,"hiveRxTime":"t","data":"${b64(b64("$PIMD8,1,2"))}"}""")),
      Gen.alphaNumStr,
      Gen.asciiPrintableStr)).sample.get
    val df = payloads.zipWithIndex.map { case (p, i) => (i.toString, p) }
      .toDF("recordId", "data")
    val classes = IngestTransforms.classify(df)
      .groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(classes.keySet.subsetOf(Set("soh", "sensor", "unknown", "error")))
    assert(classes.values.sum == payloads.length)
  }

  test("hemisphere sign fix is idempotent and independent per axis") {
    val gen = for {
      lat <- Gen.chooseNum(0.0, 90.0)
      lon <- Gen.chooseNum(0.0, 180.0)
      ns <- Gen.oneOf("N", "S")
      ew <- Gen.oneOf("E", "W")
    } yield (f"$$PIMD8,1,1,866,65098,$lat%.4f,$ns,$lon%.4f,$ew,*4F", ns, ew)
    val rows = Gen.listOfN(100, gen).sample.get
    val df = rows.toDF("sentence", "ns", "ew")
    val (lonC, latC) = IngestTransforms.parseNmea(col("sentence"))
    val bad = df.select(col("ns"), col("ew"), lonC.as("lon"), latC.as("lat"))
      .filter(
        (col("ns") === "S" && col("lat") > 0) ||
          (col("ns") === "N" && col("lat") < 0) ||
          (col("ew") === "W" && col("lon") > 0) ||
          (col("ew") === "E" && col("lon") < 0))
      .count()
    assert(bad == 0)
  }

  test("partition keys round-trip through epoch seconds for any day since 1970") {
    val epochs = Gen.listOfN(100, Gen.chooseNum(0L, 4102444799L)).sample.get
    val df = epochs.toDF("epoch")
    val keyed = IngestTransforms.withPartitionKeys(df, col("epoch"))
      .withColumn("reconstructed",
        unix_timestamp(concat_ws("-", col("year"), col("month"), col("day")),
          "yyyy-MM-dd"))
      .withColumn("day_floor", (col("epoch") / 86400).cast("long") * 86400)
    assert(keyed.filter(col("reconstructed") =!= col("day_floor")).count() == 0)
  }
}
