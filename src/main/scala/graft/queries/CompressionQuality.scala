package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset}

/** Per-document compression statistics from a REAL DEFLATE codec
  * (java.util.zip): raw/compressed sizes plus the two invariants the
  * oracle can pin without owning a zlib (see [[CompressionQuality]]). */
final case class CompressionStats(
    doc_id: Long,
    n_raw: Int,
    n_deflate: Int,
    n_deflate_dup: Int,
    round_trip_ok: Boolean,
    dup_discount_ok: Boolean)

/** Compression-ratio quality signal — the classic repetition detector in
  * web-corpus curation: boilerplate, keyword stuffing, and template spam
  * compress far better than natural prose, so `deflate_len / raw_len` is a
  * cheap quality feature computed in one narrow pass.
  *
  * The codec is the JDK's real DEFLATE (java.util.zip.Deflater/Inflater),
  * run inside `mapPartitions` with ONE Deflater+Inflater pair reset per row
  * — native zlib state is expensive to allocate, so it is per-partition
  * like every codec in this repo (Multimodal.scala's batch shape).
  *
  * Oracle strategy (the q77 bound-oracle pattern): the byte-exact DEFLATE
  * output is zlib-version-specific, so the gate never hashes `n_deflate`
  * itself. It hashes what MUST hold for any correct DEFLATE:
  *   - `round_trip_ok`  — inflate(deflate(t)) == t, bit-exact (losslessness);
  *   - `dup_discount_ok` — deflate(t·t).len < deflate(t).len + max(len/4, 24):
  *     the second copy of a ≤32 KB text sits inside the LZ77 window, so it
  *     codes as back-references (~len/50 bytes) — the margin is ~10×.
  * plus the exact `n_raw` the oracle recomputes from the corpus. The raw
  * sizes stay on the Dataset API for real consumers and are spec-pinned
  * (repetitive text compresses measurably better than prose).
  */
object CompressionQuality {

  private[queries] def deflate(defl: java.util.zip.Deflater,
      data: Array[Byte]): Array[Byte] = {
    defl.reset(); defl.setInput(data); defl.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 32)
    val buf = new Array[Byte](4096)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    out.toByteArray
  }

  private[queries] def inflate(infl: java.util.zip.Inflater,
      data: Array[Byte], sizeHint: Int): Array[Byte] = {
    infl.reset(); infl.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(sizeHint, 32))
    val buf = new Array[Byte](4096)
    while (!infl.finished()) {
      val n = infl.inflate(buf)
      // a valid stream always makes progress; a truncated one must fail
      // loudly rather than spin
      if (n == 0 && !infl.finished())
        throw new java.util.zip.DataFormatException("truncated DEFLATE stream")
      out.write(buf, 0, n)
    }
    out.toByteArray
  }

  /** One narrow pass: (doc_id, text) → [[CompressionStats]]. No shuffle. */
  def stats(docs: DataFrame): Dataset[CompressionStats] = {
    import docs.sparkSession.implicits._
    docs.select("doc_id", "text").as[(Long, String)].mapPartitions { it =>
      // per-partition codec state: Deflater/Inflater wrap native zlib
      // streams — allocate once, reset per row, and release the native
      // memory at task completion (it.map has no exhaustion hook, and
      // waiting for the GC's Cleaner lets off-heap bytes pile up on a
      // long-lived executor)
      val defl = new java.util.zip.Deflater()
      val infl = new java.util.zip.Inflater()
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ => defl.end(); infl.end() })
      it.map { case (id, text) =>
        val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val comp = deflate(defl, raw)
        val rt = java.util.Arrays.equals(inflate(infl, comp, raw.length), raw)
        val dup = new Array[Byte](raw.length * 2)
        System.arraycopy(raw, 0, dup, 0, raw.length)
        System.arraycopy(raw, 0, dup, raw.length, raw.length)
        val compDup = deflate(defl, dup)
        CompressionStats(id, raw.length, comp.length, compDup.length, rt,
          compDup.length < comp.length + math.max(raw.length / 4, 24))
      }
    }
  }
}
