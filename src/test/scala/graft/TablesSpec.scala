package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Guards against driver-side testdata regeneration changing the physical
  * parquet encoding under us (round-6 postmortem: events.ts flipped from
  * TIMESTAMP(NANOS)-read-as-long to timestamp[us]-read-as-TimestampNTZ and 47
  * queries crashed in the gate). Tables.load must surface every table, and
  * `events.ts` as a session TimestampType, regardless of the file's physical
  * type — so a future regeneration fails HERE with a named message, not as 47
  * opaque query crashes.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  test("all ten tables load from the current testdata and are non-empty") {
    val failures = Tables.names.flatMap { n =>
      try {
        if (Tables.load(spark, sfDir, n).limit(1).count() == 0)
          Some(s"$n: empty") else None
      } catch { case e: Throwable =>
        Some(s"$n: ${String.valueOf(e.getMessage).take(120)}") }
    }
    assert(failures.isEmpty,
      s"Tables.load broke on current testdata (schema drift? see " +
        s"Tables.adaptEventsTs): ${failures.mkString("; ")}")
  }

  test("events.ts surfaces as TimestampType on the current testdata") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts must be TimestampType, got ${df.schema("ts").dataType}")
    assert(df.where(col("ts").isNotNull).limit(1).count() == 1)
  }

  test("registerAll survives a poisoned table: SQL over lineitem still runs") {
    // Build a dir that mirrors sf0.001 but with an unreadable events.parquet.
    val dir = java.nio.file.Files.createTempDirectory("graft-poisoned")
    for (n <- Tables.names if n != "events")
      java.nio.file.Files.createSymbolicLink(
        dir.resolve(s"$n.parquet"),
        java.nio.file.Paths.get(s"$sfDir/$n.parquet"))
    java.nio.file.Files.write(dir.resolve("events.parquet"),
      "not a parquet file".getBytes)

    // try/finally: the session (and its catalog) is shared across suites —
    // if an assertion fails mid-test the finally still repairs the views,
    // so one failure here can't cascade into every later suite.
    try {
      Tables.registerAll(spark, dir.toString)
      // healthy tables survive the poisoned sibling
      assert(spark.sql("SELECT count(*) AS n FROM lineitem").head().getLong(0) > 0)
      // the poisoned table fails at analysis, by name, not at registration
      val err = intercept[Exception](spark.sql("SELECT * FROM events").collect())
      assert(String.valueOf(err.getMessage).contains("events"))
    } finally {
      // partial registration is not cached: a registerAll against the real
      // dir immediately repairs the catalog
      Tables.registerAll(spark, sfDir)
    }
    assert(spark.sql("SELECT count(*) AS n FROM events").head().getLong(0) > 0)
  }

  test("events.ts adapts all three physical forms: µs/ms timestamps and nanos-as-long") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-events-fixture")
    // One known instant: 2024-03-01T12:34:56.789012Z.
    val micros = 1709296496789012L

    // Form A: timestamp[us] (what the driver generates today). Writing a
    // TimestampNTZ column yields a parquet timestamp(us, tz-naive) file.
    val usPath = s"$dir/events_us.parquet"
    Seq(Tuple1(micros)).toDF("us")
      .select(timestamp_micros($"us").cast(TimestampNTZType).as("ts"),
        lit("dev-1").as("device_id"))
      .write.mode("overwrite").parquet(usPath)

    // Form B: TIMESTAMP(NANOS) — Spark can't write parquet nanos, but it
    // reads them as LongType, which is the exact shape Tables.load sees; a
    // plain long column round-trips to the same read schema.
    val nsPath = s"$dir/events_ns.parquet"
    Seq(Tuple1(micros * 1000L)).toDF("ts")
      .withColumn("device_id", lit("dev-1"))
      .write.mode("overwrite").parquet(nsPath)

    // Form C: TIMESTAMP(MILLIS) — a third plausible regeneration target
    // (round-7 verdict #8). Spark writes it under outputTimestampType=
    // TIMESTAMP_MILLIS; the value truncates to the ms grid, so the
    // expectation for this form is the ms-truncated instant.
    val msPath = s"$dir/events_ms.parquet"
    val prevOut = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
      Seq(Tuple1(micros)).toDF("us")
        .select(timestamp_micros($"us").as("ts"), lit("dev-1").as("device_id"))
        .write.mode("overwrite").parquet(msPath)
    } finally prevOut match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }

    val msTruncated = micros / 1000L * 1000L
    for ((path, want) <- Seq(usPath -> micros, nsPath -> micros,
        msPath -> msTruncated)) {
      // Tables.load resolves "<dir>/events.parquet"; point it at each fixture
      // by symlinking the expected name inside a per-form dir.
      val formDir = java.nio.file.Files.createTempDirectory("graft-form")
      java.nio.file.Files.createSymbolicLink(
        formDir.resolve("events.parquet"), java.nio.file.Paths.get(path))
      val df = Tables.events(spark, formDir.toString)
      assert(df.schema("ts").dataType == TimestampType,
        s"$path: ts must adapt to TimestampType, got ${df.schema("ts").dataType}")
      val got = df.select(unix_micros($"ts")).as[Long].head()
      assert(got == want, s"$path: expected $want µs, got $got")
    }
  }
}
