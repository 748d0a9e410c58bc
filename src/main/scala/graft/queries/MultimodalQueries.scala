package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Judge-facing multimodal surface: opaque binary payload columns with typed
  * metadata, stub-decoded features via the per-partition batch pipeline, and
  * frame sampling. Payloads here are UTF-8 bytes of `documents.text` (the
  * container has no media codecs); the Spark-side plumbing is the real thing.
  */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(

    // Binary-column metadata via pure built-ins — oracle-checkable.
    QueryDef.sql(
      "q64_media_meta",
      """SELECT doc_id AS media_id,
        |       octet_length(encode(text)) AS n_bytes,
        |       md5(text) AS content_hash,
        |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |            ELSE 'video' END AS kind
        |FROM documents
        |ORDER BY media_id""".stripMargin) { (s, d) =>
      t(s, d, "documents").select(
        col("doc_id").as("media_id"),
        length(col("text").cast("binary")).as("n_bytes"),
        md5(col("text").cast("binary")).as("content_hash"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"))
        .orderBy("media_id")
    },

    // The decode/feature-extract pipeline (mapPartitions batch shape, stub
    // decoder). EXACT oracle (upgraded from rows-only): the stub
    // accumulates per-stride byte means in double with ascending-index
    // order, and the corpus is pure ASCII, so DuckDB recomputes the same
    // arithmetic — byte i = ord(char i), bucket k sums positions with
    // (i-1)%8 = k (the CASE's 0.0 fillers keep the fold order without
    // perturbing doubles). The CRC32 checksum stays in the Dataset API
    // (per-partition-init demo, MultimodalSpec) but off the oracle row —
    // DuckDB has no crc32.
    QueryDef.sql(
      "q65_media_features",
      """SELECT doc_id AS media_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |            ELSE 'video' END AS kind,
        |       octet_length(encode(text)) AS n_bytes,
        |       round(list_sum(list_transform(generate_series(1, length(text)),
        |               i -> CASE WHEN (i-1) % 8 = 0
        |                         THEN ord(substring(text, i, 1)) / 255.0
        |                         ELSE 0.0 END)) / length(text), 6) AS f0,
        |       round(list_sum(list_transform(generate_series(1, length(text)),
        |               i -> CASE WHEN (i-1) % 8 = 1
        |                         THEN ord(substring(text, i, 1)) / 255.0
        |                         ELSE 0.0 END)) / length(text), 6) AS f1
        |FROM documents
        |ORDER BY media_id""".stripMargin) { (s, d) =>
      val media = Multimodal.fromDocuments(t(s, d, "documents"))
      Multimodal.extractFeatures(media)
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(element_at(col("feature"), 1), 6).as("f0"),
          round(element_at(col("feature"), 2), 6).as("f1"))
        .orderBy("media_id")
    },

    // Frame sampling over the opaque payload — array-of-binary handling.
    // EXACT oracle: the kept-frame count is pure integer arithmetic on the
    // byte length (frames 0..floor((len-1)/64), keep every 4th).
    QueryDef.sql(
      "q66_frame_sample",
      """SELECT doc_id AS media_id,
        |       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |            ELSE 'video' END AS kind,
        |       CAST(CAST(floor(CAST(floor((octet_length(encode(text)) - 1) / 64.0)
        |                            AS BIGINT) / 4.0) AS BIGINT) + 1 AS INT)
        |         AS n_frames_kept
        |FROM documents
        |ORDER BY media_id""".stripMargin) { (s, d) =>
      val media = Multimodal.fromDocuments(t(s, d, "documents")).toDF()
      Multimodal.sampleFrames(media)
        .select(col("media_id"), col("kind"), col("n_frames_kept"))
        .orderBy("media_id")
    }
  )
}
