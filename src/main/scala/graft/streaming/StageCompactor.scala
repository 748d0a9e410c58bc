package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for the stage zone.
  *
  * Streaming file sinks write one file per task per micro-batch — at a 60 s
  * trigger that is ~1.4k files/partition/day, and parquet scan cost is
  * dominated by per-file open/footer overhead long before data volume. The
  * compactor rewrites one event-time partition into `filesPerPartition`
  * files clustered by `deviceid` (scan locality for per-device queries),
  * atomically: write to a temp dir, then swap directories.
  *
  * This is the maintenance half of the reference's crawler/catalog role that
  * AWS leaves to S3 lifecycle tooling — here it is a first-class operation.
  */
object StageCompactor {

  /** Compact one year/month/day partition in place. Returns (filesBefore,
    * filesAfter). */
  def compactPartition(spark: SparkSession, paths: StreamingIngest.Paths,
      year: String, month: String, day: String,
      filesPerPartition: Int = 1): (Int, Int) = {
    val dir = new java.io.File(
      s"${paths.stage}/year=$year/month=$month/day=$day")
    require(dir.isDirectory, s"no such partition: $dir")
    def parquetFiles(d: java.io.File): Array[java.io.File] =
      d.listFiles().filter(f => f.getName.endsWith(".parquet"))
    val before = parquetFiles(dir)

    val tmp = new java.io.File(dir.getParentFile, s".compact-${dir.getName}")
    val rows = spark.read.parquet(dir.toString)
      .repartition(filesPerPartition)
      .sortWithinPartitions("deviceid", "date_time")
    rows.write.mode("overwrite")
      .option("compression", paths.stageCompression)
      .parquet(tmp.toString)

    // swap: remove originals, move compacted files in
    before.foreach(_.delete())
    dir.listFiles().filter(_.getName.startsWith("_")).foreach(_.delete())
    parquetFiles(tmp).zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.move(f.toPath,
        new java.io.File(dir, f"compacted-$i%05d.parquet").toPath)
    }
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    (before.length, parquetFiles(dir).length)
  }
}
