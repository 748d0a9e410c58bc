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
      assert(r.getLong(1) == r.getLong(0) + 2199023255552L) // +2·2^40 twin offset
      assert(r.getLong(2) <= 12L, s"injected pair with implausible Hamming: $r")
    }
  }

  test("real PNG decode round-trips the generated raster bit-exactly") {
    import graft.multimodal.Multimodal.Decoder
    for (id <- Seq(0L, 7L, 123L)) {
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val st = Decoder.decodeImage(id, Decoder.encodeTestPng(id, w, h)).get
      assert(st.width == w && st.height == h)
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        er += (7 * id + 11 * x + 13 * y) % 256
        eg += (5 * id + 3 * x + 17 * y) % 256
        eb += (id + 19 * x + 23 * y) % 256
      }
      assert((st.sum_r, st.sum_g, st.sum_b) == ((er, eg, eb)),
        s"channel sums must survive the PNG encode/decode round trip (id=$id)")
    }
  }

  test("JPEG payloads decode too (lossy: stats close, not exact)") {
    import graft.multimodal.Multimodal.Decoder
    val bi = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      bi.setRGB(x, y, (128 << 16) | (64 << 8) | 200)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpg", out)
    val st = Decoder.decodeImage(5L, out.toByteArray).get
    assert(st.width == 16 && st.height == 16)
    val n = 16 * 16
    assert(math.abs(st.sum_r / n.toDouble - 128) < 8 &&
      math.abs(st.sum_g / n.toDouble - 64) < 8 &&
      math.abs(st.sum_b / n.toDouble - 200) < 8,
      s"JPEG per-channel means must be within codec tolerance: $st")
  }

  test("real WAV decode round-trips the generated waveform bit-exactly") {
    import graft.multimodal.Multimodal.Decoder
    for (id <- Seq(0L, 7L, 123L)) {
      val n = (64 + id % 33).toInt
      val st = Decoder.decodeAudio(id, Decoder.encodeTestWav(id, n)).get
      assert(st.sample_rate == 8000 && st.n_samples == n.toLong)
      var sa = 0L; var sq = 0L
      for (i <- 0 until n) {
        val s = ((13 * id + 7 * i) % 4096) - 2048
        sa += s; sq += s * s
      }
      assert((st.sum_amp, st.sum_sq) == ((sa, sq)),
        s"sample sums must survive the WAV encode/decode round trip (id=$id)")
    }
  }

  test("stereo / 24-bit / 8-bit PCM WAV layouts decode exactly too") {
    import graft.multimodal.Multimodal.Decoder
    for ((ch, bits) <- Seq((2, 16), (1, 24), (2, 8), (2, 24))) {
      val id = 42L
      val n = 64 // whole frames at every channel count
      val st = Decoder.decodeAudio(id, Decoder.encodeTestWav(id, n, ch, bits)).get
      assert(st.n_samples == n.toLong,
        s"interleaved sample count must be layout-blind (ch=$ch bits=$bits)")
      var sa = 0L; var sq = 0L
      for (i <- 0 until n) {
        val s: Long =
          if (bits == 8) ((13 * id + 7 * i) % 256) - 128
          else if (bits == 24) (((13 * id + 7 * i) % 4096) - 2048) * 4096L
          else ((13 * id + 7 * i) % 4096) - 2048
        sa += s; sq += s * s
      }
      assert((st.sum_amp, st.sum_sq) == ((sa, sq)),
        s"sums must survive the $bits-bit/${ch}ch round trip")
    }
    // genuinely non-PCM encodings still take the error path: a float WAV
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_FLOAT, 8000f, 32, 1, 4,
      8000f, false)
    val pcm = new Array[Byte](4 * 16)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 16L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    assert(Multimodal.Decoder.decodeAudio(1L, out.toByteArray).isEmpty,
      "float PCM must route to the error-record path")
  }

  test("mu-law / a-law WAVs expand through the JDK codec to the G.711 closed form") {
    import graft.multimodal.Multimodal.Decoder
    // the oracle's closed forms (q332 m=4/m=5), JDK sign conventions
    def ulaw(c: Int): Long = {
      val u = 255 - c
      val mag = (((u % 16) * 8 + 132).toLong << ((u / 16) % 8)) - 132
      if (u >= 128) -mag else mag
    }
    def alaw(c: Int): Long = {
      val v = c ^ 85
      val e = (v / 16) % 8
      val mag =
        if (e == 0) ((v % 16) * 16 + 8).toLong
        else ((v % 16) * 16 + 264).toLong << (e - 1)
      if (v >= 128) mag else -mag
    }
    for ((isAlaw, table) <- Seq((false, ulaw _), (true, alaw _));
         id <- Seq(0L, 7L, 123L, 500021L)) {
      val n = (64 + id % 33).toInt
      val st = Decoder.decodeAudio(id,
        Decoder.encodeCompandedTestWav(id, n, alaw = isAlaw)).get
      var sa = 0L; var sq = 0L
      for (i <- 0 until n) {
        val s = table(((13 * id + 7 * i) % 256).toInt)
        sa += s; sq += s * s
      }
      assert(st.n_samples == n.toLong && st.sample_rate == 8000)
      assert((st.sum_amp, st.sum_sq) == ((sa, sq)),
        s"G.711 ${if (isAlaw) "a" else "mu"}-law expansion must match the " +
          s"closed form bit-exactly (id=$id): $st vs ($sa, $sq)")
    }
  }

  test("GIF decode: indexed palette round-trips exactly; animated GIFs take the first frame") {
    import graft.multimodal.Multimodal.Decoder
    for (id <- Seq(0L, 7L, 123L)) {
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val st = Decoder.decodeImage(id, Decoder.encodeTestGif(id, w, h)).get
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val j = ((7 * id + 11 * x + 13 * y) % 256).toInt
        sr += (11 * j + 3) % 256
        sg += (17 * j + 5) % 256
        sb += (23 * j + 7) % 256
      }
      assert(st.width == w && st.height == h, s"dims must survive (id=$id)")
      assert((st.sum_r, st.sum_g, st.sum_b) == ((sr, sg, sb)),
        s"palette→RGB sums must survive the GIF round trip (id=$id): $st")
    }
    // the grayscale noise fixture: luma == stored index by construction
    val nst = Decoder.decodeImage(9L, Decoder.encodeNoiseGif(9L, 32, 32)).get
    assert(nst.sum_r == nst.sum_g && nst.sum_g == nst.sum_b,
      "the gray-ramp palette must decode with identical channels")
    // ANIMATED: two frames with different patterns; decode must equal the
    // single-frame encode of frame 0 — the documented first-frame policy
    val f0 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Decoder.encodeTestGif(5L, 12, 10)))
    val f1 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Decoder.encodeTestGif(6L, 12, 10)))
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      writer.writeToSequence(new javax.imageio.IIOImage(f0, null, null), null)
      writer.writeToSequence(new javax.imageio.IIOImage(f1, null, null), null)
      writer.endWriteSequence()
      ios.flush()
    } finally { writer.dispose(); ios.close() }
    val anim = Decoder.decodeImage(5L, out.toByteArray).get
    val single = Decoder.decodeImage(5L, Decoder.encodeTestGif(5L, 12, 10)).get
    assert((anim.sum_r, anim.sum_g, anim.sum_b) ==
      ((single.sum_r, single.sum_g, single.sum_b)),
      s"animated GIF must decode its FIRST frame: $anim vs $single")
  }

  test("IMA-ADPCM WAVs decode through the hand-written step-table recurrence exactly") {
    import graft.multimodal.Multimodal.Decoder
    // independent replay of the decode recurrence (the oracle's recursive
    // CTE, in Scala) — pins nibble packing, header parsing, clamping, and
    // the fact-chunk sample count in one sweep
    def reference(id: Long, nNib: Int): (Long, Long, Long) = {
      var pred = (((7 * id) % 4096) - 2048).toInt
      var idx = (id % 89).toInt
      var sa = pred.toLong; var sq = pred.toLong * pred
      var n = 1L
      for (i <- 0 until nNib) {
        val c = ((13 * id + 7 * i) % 16).toInt
        val step = Decoder.ImaStepTable(idx)
        var diff = step >> 3
        if ((c & 4) != 0) diff += step
        if ((c & 2) != 0) diff += step >> 1
        if ((c & 1) != 0) diff += step >> 2
        pred = if ((c & 8) != 0) pred - diff else pred + diff
        if (pred > 32767) pred = 32767
        else if (pred < -32768) pred = -32768
        idx = math.max(0, math.min(88, idx + Decoder.ImaIndexTable(c & 7)))
        sa += pred; sq += pred.toLong * pred; n += 1
      }
      (n, sa, sq)
    }
    // 88L seeds the step index at the table's top (clamp boundary);
    // 500021L exercises large-id modular arithmetic like the G.711 test
    for (id <- Seq(0L, 6L, 13L, 88L, 123L, 500021L)) {
      val nNib = (64 + id % 33).toInt & ~1
      val st = Decoder.decodeAudio(id,
        Decoder.encodeImaAdpcmTestWav(id, nNib)).get
      val (n, sa, sq) = reference(id, nNib)
      assert(st.sample_rate == 8000 && st.n_samples == n,
        s"decoded count must be nibbles+1 (id=$id): $st")
      assert((st.sum_amp, st.sum_sq) == ((sa, sq)),
        s"ADPCM decode must match the recurrence bit-exactly (id=$id): " +
          s"$st vs ($sa, $sq)")
    }
    // hand-derived micro case (independent of the tables-as-code): id=0
    // gives pred0=-2048, idx0=0, nibble codes (0, 7). c=0 → diff=0, pred
    // stays -2048, idx clamps at 0; c=7 → step 7, diff=0+7+3+1=11, pred
    // -2037, so the sample stream is [-2048, -2048, -2037].
    val st0 = Decoder.decodeAudio(0L, Decoder.encodeImaAdpcmTestWav(0L, 2)).get
    assert(st0.n_samples == 3L && st0.sum_amp == -2048L - 2048L - 2037L &&
      st0.sum_sq == 2048L * 2048 * 2 + 2037L * 2037, st0.toString)
  }

  test("ADPCM error paths: stereo, corrupt step index, truncated data route to None") {
    import graft.multimodal.Multimodal.Decoder
    val good = Decoder.encodeImaAdpcmTestWav(3L, 64)
    assert(Decoder.decodeAudio(3L, good).isDefined)
    // stereo IMA (interleaved channel words) is out of decode scope —
    // error path, not a wrong-samples decode. fmt channel count lives at
    // byte 22 of the emitted fixed layout.
    val stereo = good.clone(); stereo(22) = 2
    assert(Decoder.decodeAudio(3L, stereo).isEmpty,
      "stereo ADPCM must route to the error-record path")
    // block header step index beyond the 89-entry table: malformed
    val badIdx = good.clone(); badIdx(62) = 100.toByte
    assert(Decoder.decodeAudio(3L, badIdx).isEmpty,
      "an out-of-range step index must route to the error-record path")
    // truncated data chunk (declared size overruns the payload)
    assert(Decoder.decodeAudio(3L, good.take(good.length - 4)).isEmpty,
      "a truncated ADPCM payload must route to the error-record path")
  }

  test("corrupt/non-PCM payloads are dropped by decodeAudios, not thrown") {
    import graft.multimodal.{MediaRecord, Multimodal}
    val good = Multimodal.Decoder.encodeTestWav(1L, 64)
    val rows = Seq(
      MediaRecord(1L, "audio", good),
      MediaRecord(2L, "audio", Array[Byte](1, 2, 3, 4)),
      MediaRecord(3L, "audio", good.take(20))) // truncated RIFF header+
    val got = Multimodal.decodeAudios(spark.createDataset(rows))
      .collect().map(_.media_id).toSet
    assert(got == Set(1L), s"only the valid payload decodes, got $got")
  }

  test("corrupt payloads are dropped by decodeImages, not thrown") {
    import graft.multimodal.{MediaRecord, Multimodal}
    val good = Multimodal.Decoder.encodeTestPng(1L, 8, 8)
    val rows = Seq(
      MediaRecord(1L, "image", good),
      MediaRecord(2L, "image", Array[Byte](1, 2, 3, 4)),
      MediaRecord(3L, "image", good.take(20))) // truncated PNG header+
    val got = Multimodal.decodeImages(spark.createDataset(rows))
      .collect().map(_.media_id).toSet
    assert(got == Set(1L), s"only the valid payload decodes, got $got")
  }

  test("real AVI decode round-trips the sampled frames bit-exactly") {
    import graft.multimodal.Multimodal.Decoder
    for (id <- Seq(0L, 7L, 123L)) {
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val nf = (4 + id % 5).toInt
      val st = Decoder.decodeVideo(id, Decoder.encodeTestAvi(id, w, h, nf)).get
      assert(st.width == w && st.height == h && st.n_frames == nf)
      assert(st.n_sampled == (nf + 1) / 2,
        s"every-2nd sampling must keep frames 0,2,.. (id=$id): $st")
      var er = 0L; var eg = 0L; var eb = 0L
      for (f <- 0 until nf if f % 2 == 0; y <- 0 until h; x <- 0 until w) {
        er += (7 * id + 11 * x + 13 * y + 29 * f) % 256
        eg += (5 * id + 3 * x + 17 * y + 31 * f) % 256
        eb += (id + 19 * x + 23 * y + 37 * f) % 256
      }
      assert((st.sum_r, st.sum_g, st.sum_b) == ((er, eg, eb)),
        s"sampled-frame channel sums must survive the AVI demux + BMP " +
          s"decode round trip (id=$id)")
    }
  }

  test("corrupt/compressed/truncated AVI payloads are dropped, not thrown") {
    import graft.multimodal.{MediaRecord, Multimodal}
    val good = Multimodal.Decoder.encodeTestAvi(1L, 9, 8, 5)
    // flip the BITMAPINFOHEADER's biCompression away from BI_RGB: a
    // "compressed" stream this decoder must refuse, not mis-rasterize
    val compressed = good.clone()
    val strf = good.indices.find(i => i + 4 <= good.length &&
      new String(good, i, 4, "US-ASCII") == "strf").get
    compressed(strf + 8 + 16) = 1
    val rows = Seq(
      MediaRecord(1L, "video", good),
      MediaRecord(2L, "video", Array[Byte](1, 2, 3, 4)),
      MediaRecord(3L, "video", good.take(300)), // truncated inside movi
      MediaRecord(4L, "video", compressed))
    val got = Multimodal.decodeVideos(spark.createDataset(rows))
      .collect().map(_.media_id).toSet
    assert(got == Set(1L), s"only the valid payload decodes, got $got")
  }

  test("multi-stream AVI: demux binds the vids strf and the vids chunks") {
    // hand-built two-stream AVI: stream 00 = audio (auds strl + '00wb'
    // chunks), stream 01 = video (vids strl + '01db' frames). A demux that
    // associates strh/strf across streams or collects '00'-prefixed chunks
    // would validate the audio strf or count audio chunks as frames.
    val w = 4; val h = 2; val raster = ((w * 3 + 3) / 4) * 4 * h // 24
    val bb = java.nio.ByteBuffer.allocate(4096)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    def chunkAt(): Int = bb.position()
    def patchLen(at: Int): Unit = bb.putInt(at + 4, bb.position() - at - 8)
    fcc("RIFF"); bb.putInt(0); fcc("AVI ")
    val hdrl = chunkAt(); fcc("LIST"); bb.putInt(0); fcc("hdrl")
    fcc("avih"); bb.putInt(56); (1 to 14).foreach(_ => bb.putInt(0))
    val strlA = chunkAt(); fcc("LIST"); bb.putInt(0); fcc("strl")
    fcc("strh"); bb.putInt(56); fcc("auds"); fcc("pcm ")
    (1 to 12).foreach(_ => bb.putInt(0)) // 8 + 48 = the 56-byte strh
    fcc("strf"); bb.putInt(16); (1 to 4).foreach(_ => bb.putInt(0))
    patchLen(strlA)
    val strlV = chunkAt(); fcc("LIST"); bb.putInt(0); fcc("strl")
    fcc("strh"); bb.putInt(56); fcc("vids"); fcc("DIB ")
    (1 to 12).foreach(_ => bb.putInt(0))
    fcc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(w).putInt(h)
    bb.putShort(1).putShort(24)
    bb.putInt(0).putInt(raster)
    (1 to 4).foreach(_ => bb.putInt(0))
    patchLen(strlV); patchLen(hdrl)
    val movi = chunkAt(); fcc("LIST"); bb.putInt(0); fcc("movi")
    fcc("00wb"); bb.putInt(8); bb.putLong(0x7777777777777777L) // audio bytes
    for (_ <- 0 until 2) { // two constant-gray video frames
      fcc("01db"); bb.putInt(raster)
      (0 until raster).foreach(_ => bb.put(100.toByte))
    }
    patchLen(movi)
    bb.putInt(4, bb.position() - 8) // RIFF size
    val payload = java.util.Arrays.copyOf(bb.array(), bb.position())
    val st = Multimodal.Decoder.decodeVideo(9L, payload).get
    assert(st.width == w && st.height == h)
    assert(st.n_frames == 2 && st.n_sampled == 1,
      s"must count only the VIDEO stream's chunks: $st")
    assert((st.sum_r, st.sum_g, st.sum_b) == ((800L, 800L, 800L)),
      s"constant-100 4x2 frame 0 must sum to 800/channel: $st")
  }

  test("deeply nested LIST garbage returns None, not StackOverflowError") {
    // 50k nested LISTs: each 12-byte header opens another — the walk must
    // hit its depth cap and drop the payload as malformed
    val n = 50000
    val bb = java.nio.ByteBuffer.allocate(12 + n * 12 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(n * 12 + 12); bb.put("AVI ".getBytes)
    for (i <- n to 1 by -1) {
      bb.put("LIST".getBytes); bb.putInt((i - 1) * 12 + 4 + 8)
      bb.put("hdrl".getBytes)
    }
    bb.putInt(0); bb.putInt(0)
    assert(Multimodal.Decoder.decodeVideo(1L,
      java.util.Arrays.copyOf(bb.array(), bb.position())).isEmpty)
  }

  test("video fingerprint is locality-sensitive: edit flips few bits") {
    import graft.multimodal.Multimodal.Decoder
    def bits(fp: graft.multimodal.VideoFingerprint): Long =
      java.lang.Long.bitCount(fp.b0) + java.lang.Long.bitCount(fp.b1) +
        java.lang.Long.bitCount(fp.b2) + java.lang.Long.bitCount(fp.b3)
    def ham(a: graft.multimodal.VideoFingerprint,
        b: graft.multimodal.VideoFingerprint): Long =
      java.lang.Long.bitCount(a.b0 ^ b.b0) + java.lang.Long.bitCount(a.b1 ^ b.b1) +
        java.lang.Long.bitCount(a.b2 ^ b.b2) + java.lang.Long.bitCount(a.b3 ^ b.b3)
    for (id <- Seq(0L, 5L, 120L)) {
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val nf = (4 + id % 5).toInt
      val base = Decoder.videoFingerprint(id,
        Decoder.encodeTestAvi(id, w, h, nf)).get
      val edit = Decoder.videoFingerprint(id,
        Decoder.encodeTestAvi(id, w, h, nf, bright = true)).get
      assert(bits(base) > 0, s"degenerate all-zero fingerprint (id=$id)")
      assert(ham(base, edit) <= 12,
        s"a 3-pixel edit must flip few buckets (id=$id): ${ham(base, edit)}")
    }
    // unrelated clips decorrelate: distance well above the edit distance
    val a = Decoder.videoFingerprint(3L, Decoder.encodeTestAvi(3L, 11, 11, 7)).get
    val b = Decoder.videoFingerprint(4L, Decoder.encodeTestAvi(4L, 12, 12, 8)).get
    assert(ham(a, b) > 12, s"unrelated clips too close: ${ham(a, b)}")
  }

  test("JPEG fixture decode: exact dims, recon error inside the pinned ceilings") {
    import graft.multimodal.Multimodal.Decoder
    for (id <- Seq(0L, 7L, 123L, 500077L)) {
      val w = (32 + id % 17).toInt; val h = (32 + id % 13).toInt
      val st = Decoder.jpegReconStats(id,
        Decoder.encodeTestJpeg(id, w, h), w, h).get
      assert(st.width == w && st.height == h && st.n_px == w.toLong * h)
      assert(st.err_r <= st.n_px * 20L && st.err_g <= st.n_px * 14L &&
        st.err_b <= st.n_px * 24L,
        s"lossy recon error must sit under the measured ceilings (id=$id): $st")
    }
  }

  test("corrupt JPEG payloads drop on the audit path, and dim drift is a decode error") {
    import graft.multimodal.{MediaRecord, Multimodal}
    val good = Multimodal.Decoder.encodeTestJpeg(1L, 33, 33)
    val rows = Seq(
      MediaRecord(1L, "image", good),
      MediaRecord(2L, "image", Array[Byte](1, 2, 3, 4)),
      MediaRecord(3L, "image", good.take(40))) // truncated JPEG
    val got = Multimodal.jpegReconAudits(spark.createDataset(rows))
      .collect().map(_.media_id).toSet
    assert(got == Set(1L), s"only the valid payload audits, got $got")
    // a decoded image whose dims disagree with the schedule is None too
    assert(Multimodal.Decoder.jpegReconStats(1L, good, 10, 10).isEmpty)
  }

  test("jpegAHash survives JPEG noise where flat luma leaks MCU chroma") {
    import graft.multimodal.Multimodal.Decoder
    def ham(a: graft.multimodal.ImageAHash,
        b: graft.multimodal.ImageAHash): Long =
      java.lang.Long.bitCount(a.b0 ^ b.b0) + java.lang.Long.bitCount(a.b1 ^ b.b1) +
        java.lang.Long.bitCount(a.b2 ^ b.b2) + java.lang.Long.bitCount(a.b3 ^ b.b3)
    for (id <- Seq(0L, 5L, 120L, 500010L)) {
      val w = (32 + id % 17).toInt; val h = (32 + id % 13).toInt
      val base = Decoder.jpegAHash(id,
        Decoder.encodeTestJpeg(id, w, h, smooth = false)).get
      val edit = Decoder.jpegAHash(id,
        Decoder.encodeTestJpeg(id, w, h, bright = true, smooth = false)).get
      assert(ham(base, edit) <= 12,
        s"BT.601 aHash must confine a 3-pixel edit + codec noise to few " +
          s"bits (id=$id): ${ham(base, edit)}")
    }
    // unrelated ids decorrelate (iid noise pattern): distance near 32
    val a = Decoder.jpegAHash(3L, Decoder.encodeTestJpeg(3L, 35, 35, smooth = false)).get
    val b = Decoder.jpegAHash(4L, Decoder.encodeTestJpeg(4L, 36, 36, smooth = false)).get
    assert(ham(a, b) > 12, s"unrelated JPEGs too close: ${ham(a, b)}")
  }

  test("mjpegFingerprint survives the lossy codec: edit stays local, distinct ids decorrelate") {
    import graft.multimodal.Multimodal.Decoder
    def ham(a: graft.multimodal.VideoFingerprint,
        b: graft.multimodal.VideoFingerprint): Long =
      java.lang.Long.bitCount(a.b0 ^ b.b0) + java.lang.Long.bitCount(a.b1 ^ b.b1) +
        java.lang.Long.bitCount(a.b2 ^ b.b2) + java.lang.Long.bitCount(a.b3 ^ b.b3)
    for (id <- Seq(0L, 5L, 120L, 500010L)) {
      val w = (32 + id % 17).toInt; val h = (32 + id % 13).toInt
      val nf = (4 + id % 5).toInt
      val base = Decoder.mjpegFingerprint(id,
        Decoder.encodeTestMjpegAvi(id, w, h, nf, smooth = false)).get
      val edit = Decoder.mjpegFingerprint(id,
        Decoder.encodeTestMjpegAvi(id, w, h, nf, bright = true,
          smooth = false)).get
      assert(base.width == w && base.height == h && base.n_frames == nf,
        s"container facts drifted (id=$id): $base")
      assert(ham(base, edit) <= 12,
        s"BT.601 clip fingerprint must confine a 3-pixel frame-0 edit + " +
          s"codec noise to few bits (id=$id): ${ham(base, edit)}")
    }
    // unrelated clips decorrelate (iid noise frames): distance near 32
    val a = Decoder.mjpegFingerprint(3L,
      Decoder.encodeTestMjpegAvi(3L, 35, 35, 7, smooth = false)).get
    val b = Decoder.mjpegFingerprint(4L,
      Decoder.encodeTestMjpegAvi(4L, 36, 36, 8, smooth = false)).get
    assert(ham(a, b) > 12, s"unrelated MJPEG clips too close: ${ham(a, b)}")
  }

  test("MJPEG-AVI decode: exact container facts, per-frame JPEG recon in bound") {
    import graft.multimodal.Multimodal.Decoder
    for (id <- Seq(0L, 7L, 123L)) {
      val w = (32 + id % 17).toInt; val h = (32 + id % 13).toInt
      val nf = (4 + id % 5).toInt
      val st = Decoder.mjpegReconStats(id,
        Decoder.encodeTestMjpegAvi(id, w, h, nf)).get
      assert(st.width == w && st.height == h && st.n_frames == nf &&
        st.n_sampled == (nf + 1) / 2,
        s"container facts must demux exactly (id=$id): $st")
      assert(st.err_r <= st.n_px * 20L && st.err_g <= st.n_px * 14L &&
        st.err_b <= st.n_px * 24L,
        s"sampled-frame recon error must sit under the ceilings (id=$id): $st")
    }
  }

  test("MJPEG payloads route through decodeVideos too (generic consumer)") {
    // the generic sum-stats decode accepts MJPG containers — stats are
    // codec-noisy, so assert container facts and plausible magnitudes
    import graft.multimodal.{MediaRecord, Multimodal}
    val id = 9L
    val w = (32 + id % 17).toInt; val h = (32 + id % 13).toInt
    val nf = (4 + id % 5).toInt
    val rows = Seq(
      MediaRecord(id, "video", Multimodal.Decoder.encodeTestMjpegAvi(id, w, h, nf)),
      MediaRecord(10L, "video", Array[Byte](82, 73, 70, 70))) // bare 'RIFF'
    val got = Multimodal.decodeVideos(spark.createDataset(rows)).collect()
    assert(got.map(_.media_id).toSet == Set(id))
    val st = got.head
    assert(st.width == w && st.height == h && st.n_frames == nf &&
      st.n_sampled == (nf + 1) / 2)
    val maxSum = st.n_sampled.toLong * w * h * 255L
    assert(st.sum_r > 0 && st.sum_r < maxSum && st.sum_b < maxSum)
  }

  test("truncated MJPEG frame chunks drop, and every<=0 fails loudly") {
    import graft.multimodal.Multimodal.Decoder
    val good = Decoder.encodeTestMjpegAvi(2L, 34, 34, 5)
    assert(Decoder.mjpegReconStats(2L, good.take(good.length - 40)).isEmpty,
      "a truncated final JPEG frame must take the error path")
    intercept[IllegalArgumentException] {
      Decoder.decodeVideo(2L, good, every = 0)
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
