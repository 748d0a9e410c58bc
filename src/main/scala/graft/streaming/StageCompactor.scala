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
  * Safety model — a manifest-committed swap (StageManifest), atomic on a
  * plain filesystem:
  *   - the rewrite reads EXACTLY the snapshotted input file list, so files
  *     appended by live ingest during compaction are neither duplicated nor
  *     deleted;
  *   - the compacted leaf lands first but stays INVISIBLE to stageTable
  *     readers (compacted leaves need a live-manifest entry); the single
  *     atomic `_retired.json` rename then retires the originals and
  *     activates the replacement in one step — no instant shows both;
  *   - every rename/delete return value is CHECKED (fs.rename reports
  *     failure by returning false on s3a/cross-FS — an unchecked false
  *     would delete originals whose replacement never arrived), and the
  *     compacted leaf is verified complete before the manifest commit;
  *   - original deletes happen last and are LAZY: a crash anywhere leaves
  *     a partition that reads consistently (originals before the commit,
  *     compacted after), never duplicated and never lossy;
  *   - all I/O goes through the Hadoop FileSystem of the stage path, so
  *     hdfs:///s3a:// roots work the same as local.
  */
object StageCompactor {

  /** Compact one year/month/day partition in place: every visible leaf
    * under it (micro-batch `batch_id=<n>` dirs and live compacted leaves)
    * folds into ONE `batch_id=compacted-<ts>` leaf with
    * `filesPerPartition` files clustered by deviceid. Returns (filesBefore,
    * filesAfter) counted over VISIBLE leaves.
    *
    * `lazyDeletes = true` stops after the manifest commit, leaving the
    * retired originals on disk — the crash-window state the manifest makes
    * readable; a later run (or any cleanup pass) removes them.
    *
    * `zorder = true` clusters the rewrite by the Morton interleave of
    * (deviceid, minute-of-epoch) instead of the plain (deviceid, date_time)
    * sort: every output file then has a tight min/max box in BOTH columns,
    * so parquet stats prune files for per-device AND per-time-slice
    * predicates (a single-column sort only narrows its lead column). */
  def compactPartition(spark: SparkSession, paths: StreamingIngest.Paths,
      year: String, month: String, day: String,
      filesPerPartition: Int = 1, lazyDeletes: Boolean = false,
      zorder: Boolean = false): (Int, Int) = {
    val dir = new Path(s"${paths.stage}/year=$year/month=$month/day=$day")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.isDirectory(dir), s"no such partition: $dir")
    def parquetFilesIn(p: Path): Seq[Path] =
      fs.listStatus(p).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).toSeq
    def batchLeaves(p: Path): Seq[Path] =
      fs.listStatus(p)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
        .map(_.getPath).toSeq
    // snapshot the VISIBLE leaves (manifest semantics, same as the reader;
    // the zone holds exclusively batch_id=* leaf dirs — see stageTable)
    val manifest = StageManifest.read(fs, dir)
    val leaves = batchLeaves(dir).filter(p => manifest.includes(p.getName))
    val before = leaves.flatMap(parquetFilesIn)
    require(before.nonEmpty, s"nothing to compact under $dir")

    // Rewrite exactly the snapshot — concurrent appends stay untouched.
    // (Reading explicit leaf files re-infers `batch_id` from their dirs;
    // drop it so the compacted DATA files carry only data columns and the
    // landed zone stays uniformly partition-encoded.)
    val tmp = new Path(dir, s".compact-${System.currentTimeMillis}")
    val clusterKeys: Seq[org.apache.spark.sql.Column] =
      if (zorder)
        Seq(graft.functions.ZOrder.morton2(
          org.apache.spark.sql.functions.col("deviceid"),
          (org.apache.spark.sql.functions.col("date_time") / 60).cast("long")))
      else Seq(org.apache.spark.sql.functions.col("deviceid"),
        org.apache.spark.sql.functions.col("date_time"))
    spark.read.parquet(before.map(_.toString): _*)
      .drop("batch_id")
      .repartition(filesPerPartition)
      .sortWithinPartitions(clusterKeys: _*)
      .write.mode("overwrite")
      .option("compression", paths.stageCompression)
      .parquet(tmp.toString)
    val nCompacted = parquetFilesIn(tmp).length

    // 1. land the leaf — checked rename; still INVISIBLE (not live yet)
    val target = new Path(dir, s"batch_id=compacted-${System.currentTimeMillis}")
    require(fs.rename(tmp, target), s"rename $tmp -> $target failed")
    // 2. verify it holds everything the rewrite produced
    val published = parquetFilesIn(target).length
    require(published == nCompacted && published > 0,
      s"compacted leaf $target incomplete: $published of $nCompacted files")
    // 3. THE commit: one manifest replacement retires originals + activates
    //    the new leaf — the atomic visibility flip
    StageManifest.commit(fs, dir, leaves.map(_.getName).toSet, target.getName)
    // 4. lazy cleanup — re-running the compactor is the repair procedure:
    //    every retired leaf still on disk goes (the just-replaced ones plus
    //    any a crashed run left), and so do orphaned .compact-* rewrite
    //    dirs from crashes before their rename (ours was renamed away).
    val committed = StageManifest.read(fs, dir)
    if (!lazyDeletes) {
      committed.retired
        .map(n => new Path(dir, n)).filter(fs.exists)
        .foreach(p => require(fs.delete(p, true), s"delete retired $p failed"))
      fs.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith(".compact-"))
        .foreach(p => require(fs.delete(p, true), s"delete orphan $p failed"))
    }
    val after = batchLeaves(dir)
      .filter(p => committed.includes(p.getName))
      .flatMap(parquetFilesIn)
    (before.length, after.length)
  }
}
