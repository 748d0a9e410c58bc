package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for the stage zone.
  *
  * Streaming file sinks write one file per task per micro-batch — at a 60 s
  * trigger that is ~1.4k files/partition/day, and parquet scan cost is
  * dominated by per-file open/footer overhead long before data volume. The
  * compactor rewrites one event-time partition into `filesPerPartition`
  * files clustered by `deviceid` (scan locality for per-device queries).
  *
  * Safety model (plain-filesystem compaction has no atomic multi-file
  * commit; that is what table formats add — see README round-2 notes):
  *   - the rewrite reads EXACTLY the snapshotted input file list, so files
  *     appended by live ingest during compaction are neither duplicated nor
  *     deleted;
  *   - the swap ADDS compacted files before deleting originals — a crash in
  *     between leaves a temporarily duplicated partition (repairable by
  *     re-running), never a data loss;
  *   - all I/O goes through the Hadoop FileSystem of the stage path, so
  *     hdfs:///s3a:// roots work the same as local.
  */
object StageCompactor {

  /** Compact one year/month/day partition in place. Returns (filesBefore,
    * filesAfter). */
  def compactPartition(spark: SparkSession, paths: StreamingIngest.Paths,
      year: String, month: String, day: String,
      filesPerPartition: Int = 1): (Int, Int) = {
    val dir = new Path(s"${paths.stage}/year=$year/month=$month/day=$day")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.isDirectory(dir), s"no such partition: $dir")
    def parquetFiles(p: Path): Seq[Path] =
      fs.listStatus(p).map(_.getPath).filter(_.getName.endsWith(".parquet")).toSeq
    val before = parquetFiles(dir)

    // rewrite exactly the snapshot — concurrent appends stay untouched
    val tmp = new Path(dir.getParent, s".compact-${dir.getName}")
    spark.read.parquet(before.map(_.toString): _*)
      .repartition(filesPerPartition)
      .sortWithinPartitions("deviceid", "date_time")
      .write.mode("overwrite")
      .option("compression", paths.stageCompression)
      .parquet(tmp.toString)

    // add-then-delete swap: crash window duplicates, never loses
    parquetFiles(tmp).zipWithIndex.foreach { case (f, i) =>
      fs.rename(f, new Path(dir, f"compacted-${System.currentTimeMillis}-$i%05d.parquet"))
    }
    before.foreach(f => fs.delete(f, false))
    fs.delete(tmp, true)
    (before.length, parquetFiles(dir).length)
  }
}
