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
  *   - the swap ADDS the compacted leaf before deleting originals, and
  *     every rename/delete return value is CHECKED (fs.rename reports
  *     failure by returning false on s3a/cross-FS — an unchecked false
  *     would delete originals whose replacement never arrived);
  *   - originals are deleted only after the compacted leaf is verified
  *     present with the expected file count; a crash in between leaves a
  *     temporarily duplicated partition (repairable by re-running), never
  *     a data loss;
  *   - all I/O goes through the Hadoop FileSystem of the stage path, so
  *     hdfs:///s3a:// roots work the same as local.
  */
object StageCompactor {

  /** Compact one year/month/day partition in place: every `batch_id=*`
    * micro-batch leaf under it (plus leaves from earlier compactions) folds
    * into ONE `batch_id=compacted-<ts>` leaf with `filesPerPartition` files
    * clustered by deviceid. Returns (filesBefore, filesAfter). */
  def compactPartition(spark: SparkSession, paths: StreamingIngest.Paths,
      year: String, month: String, day: String,
      filesPerPartition: Int = 1): (Int, Int) = {
    val dir = new Path(s"${paths.stage}/year=$year/month=$month/day=$day")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.isDirectory(dir), s"no such partition: $dir")
    // one level of batch_id=* leaves (tolerating legacy loose files too)
    def parquetFilesUnder(p: Path): Seq[Path] =
      fs.listStatus(p).flatMap { st =>
        if (st.isDirectory && !st.getPath.getName.startsWith("."))
          fs.listStatus(st.getPath).map(_.getPath)
            .filter(_.getName.endsWith(".parquet")).toSeq
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
        else Seq.empty[Path]
      }.toSeq
    val before = parquetFilesUnder(dir)
    require(before.nonEmpty, s"nothing to compact under $dir")

    // Rewrite exactly the snapshot — concurrent appends stay untouched.
    // (Reading explicit leaf files re-infers `batch_id` from their dirs;
    // drop it so the compacted DATA files carry only data columns and the
    // landed zone stays uniformly partition-encoded.)
    val tmp = new Path(dir, s".compact-${System.currentTimeMillis}")
    spark.read.parquet(before.map(_.toString): _*)
      .drop("batch_id")
      .repartition(filesPerPartition)
      .sortWithinPartitions("deviceid", "date_time")
      .write.mode("overwrite")
      .option("compression", paths.stageCompression)
      .parquet(tmp.toString)
    val nCompacted = parquetFilesUnder(tmp).length

    // Swap, add-then-delete, every step checked:
    // 1. one directory rename publishes the compacted leaf
    val target = new Path(dir, s"batch_id=compacted-${System.currentTimeMillis}")
    require(fs.rename(tmp, target), s"rename $tmp -> $target failed")
    // 2. verify the published leaf holds everything the rewrite produced
    val published = parquetFilesUnder(target).length
    require(published == nCompacted && published > 0,
      s"compacted leaf $target incomplete: $published of $nCompacted files")
    // 3. only now drop the originals (checked), then their empty leaf dirs
    before.foreach(f => require(fs.delete(f, false), s"delete $f failed"))
    before.map(_.getParent).distinct
      .filter(p => p != dir && fs.listStatus(p).isEmpty)
      .foreach(p => require(fs.delete(p, false), s"delete $p failed"))
    (before.length, parquetFilesUnder(dir).length)
  }
}
