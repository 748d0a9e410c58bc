package graft.ingest

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pipeline telemetry via `observe()`: ingest counters (rows, error rate,
  * null keys) ride the SAME job as the transform — no second scan, no
  * accumulator plumbing. The monitoring pattern the reference implements
  * with per-invocation CloudWatch metrics (hello.py's record counters),
  * expressed as a zero-extra-pass Spark primitive. */
class ObservationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("ingest counters ride the transform job — one scan, exact counts") {
    import spark.implicits._
    val raw = Seq(
      (1L, "soh", "ok"), (2L, "sensor", "ok"), (3L, "error", "bad b64"),
      (4L, "soh", "ok"), (5L, "error", "bad json"), (6L, "unknown", "ok"))
      .toDF("record_id", "cls", "payload")
    val obs = Observation("ingest-batch")
    val staged = raw.observe(obs,
      count(lit(1)).as("n_records"),
      sum(when(col("cls") === "error", 1L).otherwise(0L)).as("n_errors"),
      sum(when(col("cls") === "unknown", 1L).otherwise(0L)).as("n_unknown"))
      .filter(col("cls") =!= "error")
    assert(staged.count() == 4)
    val m = obs.get
    assert(m("n_records") == 6L)
    assert(m("n_errors") == 2L)
    assert(m("n_unknown") == 1L)
  }

  test("observed metrics match a driver recount on a real query frame") {
    val obs = Observation("docs")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .observe(obs, count(lit(1)).as("rows"),
        sum(length(col("text")).cast("long")).as("chars"))
    val n = docs.count()
    val m = obs.get
    assert(m("rows") == n)
    assert(m("chars").asInstanceOf[Long] > 0)
  }
}
