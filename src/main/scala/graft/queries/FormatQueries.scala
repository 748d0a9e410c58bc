package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interchange-format coverage: the engine must round-trip its tables
  * through the formats a lake actually contains (CSV landing zones, ORC
  * from legacy Hive, Parquet as native) without losing a row, a
  * microsecond, or a quote character. The gate aggregates the
  * ROUND-TRIPPED copies against a DuckDB oracle computed from the original
  * parquet — equality proves losslessness end-to-end (writer AND reader),
  * not just "it didn't crash".
  */
object FormatQueries {

  /** Bump when the fixture construction changes. */
  private val FixtureVersion = 1L

  /** q118's freshness-fingerprint discipline, reused: the CSV/ORC copies
    * are a deterministic function of the events parquet, so they are
    * written at most once per (testdata content, construction version) —
    * an unconditional overwrite would charge two corpus rewrites to every
    * bench execution. Fingerprint = per-file FNV-1a over name|size|mtime +
    * parquet footer tail, summed (not xor'd). */
  private def fixtureDir(s: SparkSession, d: String): String = {
    val src = new java.io.File(d, "events.parquet")
    def fileSig(f: java.io.File): Long = {
      var h = 0xcbf29ce484222325L
      def mix(b: Byte): Unit = { h ^= (b & 0xffL); h *= 0x100000001b3L }
      s"${f.getName}|${f.length}|${f.lastModified}".getBytes("UTF-8").foreach(mix)
      if (f.getName.endsWith(".parquet") && f.length > 0) {
        val raf = new java.io.RandomAccessFile(f, "r")
        try {
          val n = math.min(1024L, f.length).toInt
          raf.seek(f.length - n)
          val buf = new Array[Byte](n)
          raf.readFully(buf)
          buf.foreach(mix)
        } finally raf.close()
      }
      h
    }
    val stamp = Option(src.listFiles()).map(_.map(fileSig).sum)
      .getOrElse(src.lastModified())
    val key = java.lang.Long.toHexString(stamp ^ FixtureVersion)
    val base = s"graft_fmt_q208_${new java.io.File(d).getName}_"
    val dir = s"/tmp/$base$key"
    if (!new java.io.File(s"$dir/csv", "_SUCCESS").exists() ||
        !new java.io.File(s"$dir/orc", "_SUCCESS").exists()) {
      Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(base) && f.getName != s"$base$key")
        .foreach { old =>
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
            f.delete(); ()
          }
          rm(old)
        }
      val ev = t(s, d, "events")
      // microsecond timestamps survive CSV only with an explicit format;
      // header on so the read is schema-by-name, quoting defaults handle
      // the JSON props column
      ev.write.mode("overwrite").option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(s"$dir/csv")
      ev.write.mode("overwrite").orc(s"$dir/orc")
    }
    dir
  }

  private def profile(df: DataFrame, format: String): DataFrame =
    df.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct("user_id").as("n_users"),
        round(sum("value"), 6).as("sum_value"),
        min("ts").as("min_ts"), max("ts").as("max_ts"),
        sum(length(col("props"))).as("props_chars"))
      .withColumn("format", lit(format))
      .select("format", "event_type", "n", "n_users", "sum_value",
        "min_ts", "max_ts", "props_chars")

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q208_format_roundtrip", {
        val one =
          """SELECT '%s' AS format, event_type,
            |       CAST(count(*) AS BIGINT) AS n,
            |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
            |       round(sum(value), 6) AS sum_value,
            |       min(ts) AS min_ts, max(ts) AS max_ts,
            |       CAST(sum(length(props)) AS BIGINT) AS props_chars
            |FROM events GROUP BY event_type""".stripMargin
        s"""${one.format("csv")}
           |UNION ALL
           |${one.format("orc")}
           |ORDER BY format, event_type""".stripMargin
      }) { (s, d) =>
      val dir = fixtureDir(s, d)
      val schema = t(s, d, "events").schema
      val csv = s.read.schema(schema).option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(s"$dir/csv")
      val orc = s.read.schema(schema).orc(s"$dir/orc")
      profile(csv, "csv").unionByName(profile(orc, "orc"))
        .orderBy("format", "event_type")
    }
  )
}
