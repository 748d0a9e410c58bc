package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media record: structured metadata + an opaque binary payload — the
  * reference's envelope pattern (base64 `data` beside typed header fields,
  * SURVEY.md §7.4 "multimodal") generalized to image/audio/video bytes. */
final case class MediaRecord(
    media_id: Long,
    kind: String,          // "image" | "audio" | "video"
    payload: Array[Byte])

/** Decoded features for one media record. */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    checksum: Long,
    feature: Array[Double]) // fixed-dim embedding from the (stubbed) decoder

/** Multimodal-column plumbing (SURVEY.md §7.4): treat media as opaque binary
  * columns with typed metadata; run decode/feature-extraction as a
  * per-partition batch pipeline — the Scala analog of `mapInPandas`
  * (`Dataset.mapPartitions` over case-class rows: one iterator per partition,
  * expensive codec state initialized once per partition, not per row).
  *
  * The decoder itself is a STUB — this container has no image/audio codecs —
  * but everything Spark-side is real and tested: the schema, the binary
  * column handling, the partition batch shape, and the per-partition init.
  * A real deployment swaps [[Decoder.decodeStub]] for a JNI/codec call and
  * nothing else changes.
  */
object Multimodal {

  val FeatureDim = 8

  object Decoder {
    /** STUB decode: deterministic fake features (per-stride byte means).
      * Accumulates in DOUBLE with ascending-index order so the result is
      * bit-deterministic and engine-comparable (q65's oracle recomputes the
      * same arithmetic in SQL); a real codec replaces this wholesale —
      * signature and batch usage stay identical. */
    def decodeStub(payload: Array[Byte]): Array[Double] = {
      val f = new Array[Double](FeatureDim)
      var i = 0
      while (i < payload.length) {
        f(i % FeatureDim) += (payload(i) & 0xff) / 255.0
        i += 1
      }
      if (payload.length > 0) {
        var k = 0
        while (k < FeatureDim) { f(k) /= payload.length; k += 1 }
      }
      f
    }
  }

  /** Wrap a text corpus as media records (payload = UTF-8 bytes) — the test
    * stand-in for real media files; at scale this is `spark.read.format
    * ("binaryFile")` or payload columns in parquet. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      // deterministic kind assignment so all three branches exercise
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** The decode/feature-extract stage: per-partition batches, codec state
    * initialized once per partition (the mapInPandas batch shape). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // Per-partition init: a real impl opens its codec/JNI context here,
      // once for the whole batch — never per record.
      val crc = new java.util.zip.CRC32()
      batch.map { r =>
        crc.reset()
        crc.update(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length, crc.getValue,
          Decoder.decodeStub(r.payload))
      }
    }
  }

  /** Frame-sampling shape: cut the payload into fixed-size "frames" and keep
    * every k-th — pure built-ins (no decode), showing array-of-binary
    * handling on the opaque column. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, every: Int = 4): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      filter(
        transform(
          sequence(lit(0L), ((length(col("payload")) - 1) / frameBytes).cast("long")),
          i => struct(i.as("frame_no"),
            col("payload").substr(i * frameBytes + 1, lit(frameBytes))
              .as("bytes"))),
        f => f.getField("frame_no") % every === 0).as("frames"))
      .withColumn("n_frames_kept", size(col("frames")))
}
