package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.ingest.IngestTransforms

class EnvelopeSourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  val headerJson =
    s"""{"packetId":1,"deviceType":1,"deviceId":5,"userApplicationId":1,"organizationId":1,"len":1,"status":0,"hiveRxTime":"x","data":"${b64("""{"ln":1.0,"lt":2.0,"d":1678759166}""")}"}"""

  test("kafka frames map to the envelope contract and classify") {
    val kafka = Seq(
      ("ingest", 0, 41L, "k1".getBytes, headerJson.getBytes))
      .toDF("topic", "partition", "offset", "key", "value")
    val env = EnvelopeSources.fromKafka(kafka)
    assert(env.columns.toSeq == Seq("recordId", "data"))
    val row = env.collect().head
    assert(row.getString(0) == "ingest-0-41")
    val cls = IngestTransforms.classify(env).select("cls").as[String].collect()
    assert(cls.toSeq == Seq("soh"))
  }

  test("text-line drops map to the envelope contract and classify") {
    val lines = Seq(b64(headerJson)).toDF("value")
    val env = EnvelopeSources.fromTextLines(lines)
    assert(env.columns.toSeq == Seq("recordId", "data"))
    val cls = IngestTransforms.classify(env).select("cls").as[String].collect()
    assert(cls.toSeq == Seq("soh"))
  }
}
