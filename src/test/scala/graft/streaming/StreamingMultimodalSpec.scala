package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.multimodal.{MediaRecord, Multimodal}

/** Streaming-only semantics of the multimodal decode pipeline — the
  * restart/exactly-once behavior q342's batch-parity oracle cannot
  * express. */
class StreamingMultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def writeMedia(dir: String, part: String,
      rows: Seq[MediaRecord]): Unit = {
    // the file source lists the directory non-recursively: land each
    // batch as one flat parquet file, like a real ingest drop zone
    val stage = s"${dir}_stage_$part"
    spark.createDataset(rows).toDF().coalesce(1).write.parquet(stage)
    val f = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    new java.io.File(dir).mkdirs()
    Files.move(f.toPath, java.nio.file.Path.of(dir, s"$part.parquet"))
    ()
  }

  private def png(id: Long): Array[Byte] = {
    val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
    Multimodal.Decoder.encodeTestPng(id, w, h)
  }

  test("checkpoint restart processes only unseen files; replay never duplicates") {
    val root = Files.createTempDirectory("graft-smm").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    writeMedia(src, "p0", Seq(MediaRecord(1L, "image", png(1L)),
      MediaRecord(2L, "image", png(2L))))
    StreamingMultimodal.runFileToFile(spark, src, out, ckpt)
    val first = StreamingMultimodal.readSink(spark, out)
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(first == Seq(1L, 2L), s"initial drain must decode both: $first")

    // drain again with NOTHING new: the sink must not grow (idempotent
    // replay — the commit log already holds these epochs)
    StreamingMultimodal.runFileToFile(spark, src, out, ckpt)
    assert(StreamingMultimodal.readSink(spark, out).count() == 2L,
      "an empty resume must not duplicate rows")

    // land a new source file and resume from the SAME checkpoint: exactly
    // the new record is appended
    writeMedia(src, "p1", Seq(MediaRecord(3L, "image", png(3L))))
    StreamingMultimodal.runFileToFile(spark, src, out, ckpt)
    val resumed = StreamingMultimodal.readSink(spark, out)
      .select("media_id").as[Long].collect().sorted.toSeq
    assert(resumed == Seq(1L, 2L, 3L),
      s"resume must process only the unseen file, once: $resumed")
  }

  test("corrupt payloads drop as error records inside the stream") {
    val root = Files.createTempDirectory("graft-smm-err").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    writeMedia(src, "p0", Seq(
      MediaRecord(1L, "image", png(1L)),
      MediaRecord(2L, "image", Array[Byte](9, 9, 9, 9))))
    StreamingMultimodal.runFileToFile(spark, src, out, ckpt)
    val got = StreamingMultimodal.readSink(spark, out)
      .select("media_id").as[Long].collect().toSeq
    assert(got == Seq(1L), s"only the valid payload decodes, got $got")
  }

  test("decodeWithFingerprint parses each payload exactly once (sums + hash share the raster)") {
    val media = (0L until 24L).map(i => MediaRecord(i, "image", png(i)))
    val ds = spark.createDataset(media)
    // local[*] keeps executors in THIS JVM, so the decoder's call counter
    // sees every task's decode; suites run sequentially in the forked
    // test JVM, so nothing else decodes concurrently
    val before = Multimodal.Decoder.decodeCalls.get()
    val rows = StreamingMultimodal.decodeWithFingerprint(ds).collect()
    val decodes = Multimodal.Decoder.decodeCalls.get() - before
    assert(rows.length == 24)
    assert(decodes == 24L,
      s"one ImageIO parse per record required, measured $decodes for 24 " +
        "records — the round-13 two-pass regression is back")
    // and the single-pass rows equal the two separate batch operators'
    val stats = Multimodal.decodeImages(ds).collect()
      .map(s => s.media_id -> s).toMap
    val hashes = Multimodal.imageAHashes(ds).collect()
      .map(a => a.media_id -> a).toMap
    rows.foreach { r =>
      val s = stats(r.media_id); val a = hashes(r.media_id)
      assert((r.width, r.height, r.sum_r, r.sum_g, r.sum_b) ==
        (s.width, s.height, s.sum_r, s.sum_g, s.sum_b))
      assert((r.b0, r.b1, r.b2, r.b3) == (a.b0, a.b1, a.b2, a.b3))
    }
  }

  test("streamed decode rows equal the batch operator's rows bit-exactly") {
    val root = Files.createTempDirectory("graft-smm-par").toString
    val src = s"$root/src"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val media = (0L until 20L).map(i => MediaRecord(i, "image", png(i)))
    writeMedia(src, "p0", media)
    StreamingMultimodal.runFileToFile(spark, src, out, ckpt)
    val streamed = StreamingMultimodal.readSink(spark, out)
      .orderBy("media_id").collect().toSeq
    val batch = StreamingMultimodal
      .decodeWithFingerprint(spark.createDataset(media)).toDF()
      .orderBy("media_id").collect().toSeq
    assert(streamed == batch,
      "the same mapPartitions stage must produce identical rows on both paths")
  }

  test("audio and video stages stream under the same wrapper: batch parity + idempotent re-drain") {
    val root = Files.createTempDirectory("graft-smm-av").toString
    // audio: one row per fixture layout (mono/stereo 16, mono 24,
    // stereo 8, u-law, a-law, IMA-ADPCM — ids 0..6 cycle the %7 schedule)
    val wavs = (0L until 7L).map { id =>
      MediaRecord(id, "audio", (id % 7) match {
        case 4L => Multimodal.Decoder.encodeCompandedTestWav(id, 64, alaw = false)
        case 5L => Multimodal.Decoder.encodeCompandedTestWav(id, 64, alaw = true)
        case 6L => Multimodal.Decoder.encodeImaAdpcmTestWav(id, 64)
        case m =>
          val (ch, bits) = m match {
            case 0L => (1, 16); case 1L => (2, 16); case 2L => (1, 24)
            case _ => (2, 8)
          }
          Multimodal.Decoder.encodeTestWav(id, 64, ch, bits)
      })
    }
    writeMedia(s"$root/asrc", "p0", wavs)
    StreamingMultimodal.runAudioToFile(spark, s"$root/asrc", s"$root/aout",
      s"$root/ackpt")
    val aStreamed = StreamingMultimodal.readSink(spark, s"$root/aout")
      .orderBy("media_id").collect().toSeq
    val aBatch = Multimodal.decodeAudios(spark.createDataset(wavs)).toDF()
      .orderBy("media_id").collect().toSeq
    assert(aStreamed == aBatch && aStreamed.size == 7,
      s"streamed audio rows must equal the batch operator's: $aStreamed")
    // re-drain with nothing new: commit log must not grow the sink
    StreamingMultimodal.runAudioToFile(spark, s"$root/asrc", s"$root/aout",
      s"$root/ackpt")
    assert(StreamingMultimodal.readSink(spark, s"$root/aout").count() == 7L)

    // video: a handful of clips through the demux + sampling stage
    val avis = (0L until 5L).map { id =>
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val nf = (4 + id % 5).toInt
      MediaRecord(id, "video", Multimodal.Decoder.encodeTestAvi(id, w, h, nf))
    }
    writeMedia(s"$root/vsrc", "p0", avis)
    StreamingMultimodal.runVideoToFile(spark, s"$root/vsrc", s"$root/vout",
      s"$root/vckpt")
    val vStreamed = StreamingMultimodal.readSink(spark, s"$root/vout")
      .orderBy("media_id").collect().toSeq
    val vBatch = Multimodal.decodeVideos(spark.createDataset(avis)).toDF()
      .orderBy("media_id").collect().toSeq
    assert(vStreamed == vBatch && vStreamed.size == 5,
      s"streamed video rows must equal the batch operator's: $vStreamed")
  }
}
