package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Streaming CDC materialization: upserts and deletes land in the snapshot
  * in seq order, and a checkpoint-replayed batch does not double-apply. */
class StreamingUpsertSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def snapshot(dir: String): Set[(Long, String)] =
    StreamingUpsert.read(spark, dir)
      .select("key", "payload").as[(Long, String)].collect().toSet

  test("changelog batches materialize as versioned snapshots; replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, String, Long)]
    val dir = Files.createTempDirectory("graft-upsert")
    val snap = dir.resolve("snap").toString
    val ckpt = dir.resolve("ckpt").toString
    def runOnce(): Unit = {
      val q = StreamingUpsert.start(
        source.toDF().toDF("key", "payload", "op", "seq"), snap, ckpt)
      q.awaitTermination()
    }

    // batch 0: two inserts, one key updated twice in-batch (seq 12 wins)
    source.addData((1L, "a1", "U", 10L), (2L, "b1", "U", 11L),
      (1L, "a2", "U", 12L))
    runOnce()
    assert(snapshot(snap) == Set((1L, "a2"), (2L, "b1")))

    // batch 1: delete k1, insert k3, update k2
    source.addData((1L, "", "D", 20L), (3L, "c1", "U", 21L),
      (2L, "b2", "U", 22L))
    runOnce()
    assert(snapshot(snap) == Set((2L, "b2"), (3L, "c1")))

    // replay: delete the checkpoint's commit log for batch 1 is not
    // simulable directly, but re-running with no new data must not
    // re-apply or fork versions — AvailableNow with an up-to-date
    // checkpoint is a no-op
    runOnce()
    assert(snapshot(snap) == Set((2L, "b2"), (3L, "c1")))

    // the idempotence guard itself: re-committing an already-committed
    // batchId is a SKIP even when handed different data (at-least-once
    // replays deliver the same batch content; the guard keys on batchId)
    StreamingUpsert.commitBatch(spark,
      Seq((9L, "zz", "U", 99L)).toDF("key", "payload", "op", "seq"),
      snap, 1L, "key", "seq")
    assert(snapshot(snap) == Set((2L, "b2"), (3L, "c1")),
      "replayed batchId must not double-apply")

    // out-of-order seq within a batch: older seq cannot beat newer
    StreamingUpsert.commitBatch(spark,
      Seq((2L, "stale", "U", 5L), (2L, "b3", "U", 30L))
        .toDF("key", "payload", "op", "seq"),
      snap, 2L, "key", "seq")
    assert(snapshot(snap) == Set((2L, "b3"), (3L, "c1")))
  }
}
