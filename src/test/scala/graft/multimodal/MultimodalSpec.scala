package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val docs = Seq(
    (0L, "hello world this is a test document"),
    (1L, "x" * 300),
    (2L, "short")).toDF("doc_id", "text")

  test("media records carry typed metadata beside the opaque payload") {
    val media = Multimodal.fromDocuments(docs).collect().sortBy(_.media_id)
    assert(media.map(_.kind).toSeq == Seq("image", "audio", "video"))
    assert(media(1).payload.length == 300)
    assert(new String(media(0).payload, "UTF-8").startsWith("hello world"))
  }

  test("feature extraction: per-partition batch pipeline, deterministic stub features") {
    val feats = Multimodal.extractFeatures(Multimodal.fromDocuments(docs))
      .collect().sortBy(_.media_id)
    assert(feats.forall(_.feature.length == Multimodal.FeatureDim))
    // checksum matches a locally computed CRC32
    val crc = new java.util.zip.CRC32()
    crc.update("short".getBytes("UTF-8"))
    assert(feats(2).checksum == crc.getValue)
    assert(feats(2).n_bytes == 5)
    // pipeline delivers the decoder's output faithfully through mapPartitions
    assert(feats(1).feature.toSeq ==
      Multimodal.Decoder.decodeStub(("x" * 300).getBytes("UTF-8")).toSeq)
    // deterministic across runs
    val again = Multimodal.extractFeatures(Multimodal.fromDocuments(docs))
      .collect().sortBy(_.media_id)
    assert(again.map(_.feature.toSeq).toSeq == feats.map(_.feature.toSeq).toSeq)
  }

  test("q170 aHash near-dup recovers the injected pairs with small Hamming") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q170_phash_neardup")(spark, sf)
      .collect()
    assert(rows.nonEmpty, "the injected near-dups must be detected")
    val injected = rows.filter(_.getBoolean(3))
    val eligible = graft.Tables.load(spark, sf, "documents")
      .filter(col("source") === "src0" && length(col("text")) >= 30).count()
    assert(injected.length >= (eligible * 8) / 10,
      s"aHash banding must recover >=80% of ${eligible} injected pairs, " +
        s"got ${injected.length}")
    injected.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + 200000L)
      assert(r.getLong(2) <= 12L, s"injected pair with implausible Hamming: $r")
    }
  }

  test("frame sampling keeps every 4th 64-byte frame") {
    val out = Multimodal.sampleFrames(Multimodal.fromDocuments(docs).toDF())
      .select($"media_id", $"n_frames_kept").as[(Long, Int)].collect().toMap
    // 300 bytes -> frames 0..4 -> kept: 0, 4 -> 2
    assert(out(1L) == 2)
    // 5 bytes -> frame 0 -> kept 1
    assert(out(2L) == 1)
  }
}
