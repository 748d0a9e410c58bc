package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC materialization: a changelog stream continuously MERGEd
  * into a keyed snapshot table on disk — the streaming form of the q101
  * batch apply, and the poor-man's MERGE INTO every lakehouse sink needs.
  *
  * Layout: one immutable snapshot dir per applied micro-batch,
  * `<dir>/v=<batchId>`, committed by Spark's own `_SUCCESS` marker. The
  * current table is the highest committed version; a replayed batch (after
  * checkpoint restart) finds its version already committed and SKIPS —
  * exactly-once snapshots from at-least-once batch delivery, the same
  * batchId-idempotence contract as the ingest sinks (ST5). A crash
  * mid-write leaves a versioned dir without `_SUCCESS`, which readers
  * ignore and the replay overwrites.
  *
  * 100 TB shape: each commit costs one latest-per-key window over the
  * BATCH (small) plus one anti-join against the snapshot — both shuffle on
  * the key; the snapshot is rewritten per batch (simple, immutable
  * versions). A production variant partitions the snapshot by key range and
  * rewrites only touched partitions — the layout hook is the same.
  */
object StreamingUpsert {

  /** Row-level upsert/delete apply: reduce `changes` to its latest change
    * per key (by `seq` descending), drop snapshot rows for keys with any
    * change, then append the upserted rows. `changes` carries the snapshot
    * schema plus `op` ('U' upsert / 'D' delete) and `seq` columns. */
  def merge(snapshot: DataFrame, changes: DataFrame,
      key: String, seq: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(seq).desc)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    snapshot.join(latest.select(key), Seq(key), "left_anti")
      .unionByName(latest.filter(col("op") === "U").drop("op", seq))
  }

  private def committedVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.isDirectory(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .filter(st => fs.exists(
        new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .flatMap(_.getPath.getName.stripPrefix("v=").toLongOption)
  }

  /** The current materialized snapshot (empty schema-less read is an error
    * before the first commit — check `hasSnapshot`). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val vs = committedVersions(spark, dir)
    require(vs.nonEmpty, s"no committed snapshot under $dir")
    spark.read.parquet(s"$dir/v=${vs.max}")
  }

  def hasSnapshot(spark: SparkSession, dir: String): Boolean =
    committedVersions(spark, dir).nonEmpty

  /** Apply one micro-batch; SKIPS if `batchId` is already committed (the
    * checkpoint-replay case). Exposed for foreachBatch and for tests. */
  def commitBatch(spark: SparkSession, batch: DataFrame, dir: String,
      batchId: Long, key: String, seq: String): Unit = {
    val vs = committedVersions(spark, dir)
    if (vs.contains(batchId)) return // replayed batch: snapshot already has it
    val base =
      if (vs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(
            batch.schema.filterNot(f => f.name == "op" || f.name == seq)))
      else spark.read.parquet(s"$dir/v=${vs.max}")
    merge(base, batch, key, seq)
      .write.mode("overwrite").parquet(s"$dir/v=$batchId")
  }

  /** Start the continuous materialization of a changelog stream into
    * `snapshotDir`. The stream must carry the snapshot schema plus
    * (`op`, `seq`). */
  def start(changes: DataFrame, snapshotDir: String, checkpoint: String,
      key: String = "key", seq: String = "seq",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch.sparkSession, batch, snapshotDir, batchId, key, seq)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
