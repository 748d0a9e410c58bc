package graft.tools

import graft.multimodal.Multimodal.Decoder

/** Measurement harness behind the q339/q340 bound-oracle ceilings: JPEG
  * is lossy, so the gate pins (a) per-channel mean reconstruction-error
  * ceilings and (b) the injected near-dup recall (shared LSH band +
  * Hamming bound) instead of exact sums. This probe measures the actual
  * maxima over the fixture id/dimension schedule — including large ids,
  * since the sf1 corpus reaches doc_id ~5e5 — so the pinned ceilings are
  * evidence, not guesses. sbt "runMain graft.tools.JpegProbe [nIds]"
  */
object JpegProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val ids: Seq[Long] =
      (0L until n.toLong) ++ (0L until n.toLong).map(_ * 251L + 1099511627776L)

    // (a) reconstruction error: max per-channel mean |err| over all ids
    var mr = 0.0; var mg = 0.0; var mb = 0.0
    var sumR = 0.0; var cnt = 0
    ids.foreach { id =>
      val w = (32 + id % 17).toInt; val h = (32 + id % 13).toInt
      val jp = Decoder.encodeTestJpeg(id, w, h)
      val st = Decoder.jpegReconStats(id, jp, w, h).get
      val er = st.err_r.toDouble / st.n_px
      val eg = st.err_g.toDouble / st.n_px
      val eb = st.err_b.toDouble / st.n_px
      mr = math.max(mr, er); mg = math.max(mg, eg); mb = math.max(mb, eb)
      sumR += er; cnt += 1
    }
    println(f"[jpeg-probe] recon err: max mean R=$mr%.2f G=$mg%.2f B=$mb%.2f" +
      f"  (avg R=${sumR / cnt}%.2f over $cnt ids)")

    // (b) injected near-dup: base vs bright-patch JPEG, aHash Hamming +
    // shared clean bands (band equality is the LSH candidate condition)
    var maxHd = 0; var minShared = 4; var missed = 0
    ids.filter(_ % 5 == 0).foreach { id =>
      val w = (32 + id % 17).toInt; val h = (32 + id % 13).toInt
      val a = Decoder.jpegAHash(id,
        Decoder.encodeTestJpeg(id, w, h, smooth = false)).get
      val b = Decoder.jpegAHash(id,
        Decoder.encodeTestJpeg(id, w, h, bright = true, smooth = false)).get
      val bandsA = Array(a.b0, a.b1, a.b2, a.b3)
      val bandsB = Array(b.b0, b.b1, b.b2, b.b3)
      val hd = bandsA.zip(bandsB).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
      val shared = bandsA.zip(bandsB).count { case (x, y) => x == y }
      maxHd = math.max(maxHd, hd)
      minShared = math.min(minShared, shared)
      // miss criterion matches q340's gate EXACTLY (round-13 ADVICE: the
      // probe's old hd>16 cut measured recall against a looser threshold
      // than the query enforces): a pair is found only if some band
      // collides (the LSH candidate condition) AND hd <= 12 (the verify)
      if (shared == 0 || hd > 12) missed += 1
    }
    println(f"[jpeg-probe] near-dup: max Hamming=$maxHd  min shared bands=" +
      f"$minShared  missed(no band or hd>12)=$missed")

    // (c) false positives among DISTINCT base ids: band-collision pairs
    // that also pass the Hamming verify — should be ~zero
    val hashes = ids.take(n).map { id =>
      val w = (32 + id % 17).toInt; val h = (32 + id % 13).toInt
      val ah = Decoder.jpegAHash(id,
        Decoder.encodeTestJpeg(id, w, h, smooth = false)).get
      (id, Array(ah.b0, ah.b1, ah.b2, ah.b3))
    }
    val byBand = scala.collection.mutable.HashMap
      .empty[(Int, Long), List[Int]].withDefaultValue(Nil)
    hashes.zipWithIndex.foreach { case ((_, bs), i) =>
      bs.zipWithIndex.foreach { case (v, bi) =>
        byBand((bi, v)) = i :: byBand((bi, v)) }
    }
    val candPairs = byBand.values.flatMap { l =>
      for (a <- l; b <- l if a < b) yield (a, b) }.toSet
    val fp = candPairs.count { case (i, j) =>
      val hd = hashes(i)._2.zip(hashes(j)._2).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
      hd <= 12
    }
    println(s"[jpeg-probe] fp: ${candPairs.size} band-collision pairs among " +
      s"$n distinct ids, $fp pass hd<=12")
  }
}

/** MJPEG recon-ceiling measurement (q341): max per-channel mean |err|
  * over the fixture schedule, sampled frames only, plus a sanity decode
  * of container facts. sbt "runMain graft.tools.MjpegProbe [nIds]" */
object MjpegProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val ids: Seq[Long] =
      (0L until n.toLong) ++ (0L until n.toLong).map(_ * 251L + 1099511627776L)
    var mr = 0.0; var mg = 0.0; var mb = 0.0; var bad = 0
    ids.foreach { id =>
      val w = (32 + id % 17).toInt; val h = (32 + id % 13).toInt
      val nf = (4 + id % 5).toInt
      val av = Decoder.encodeTestMjpegAvi(id, w, h, nf)
      Decoder.mjpegReconStats(id, av) match {
        case Some(st) =>
          if (st.width != w || st.height != h || st.n_frames != nf ||
            st.n_sampled != (nf + 1) / 2) bad += 1
          mr = math.max(mr, st.err_r.toDouble / st.n_px)
          mg = math.max(mg, st.err_g.toDouble / st.n_px)
          mb = math.max(mb, st.err_b.toDouble / st.n_px)
        case None => bad += 1
      }
    }
    println(f"[mjpeg-probe] recon err: max mean R=$mr%.2f G=$mg%.2f " +
      f"B=$mb%.2f  bad=$bad over ${ids.size} clips")

    // (b) injected near-dup over the NOISE regime (q344's fixture): base
    // vs bright-patch MJPEG clip, BT.601 fingerprint Hamming + shared
    // bands — miss criterion IS the q344 gate (band collision + hd<=12)
    var maxHd = 0; var minShared = 4; var missed = 0; var pairs = 0
    ids.filter(_ % 5 == 0).foreach { id =>
      val w = (32 + id % 17).toInt; val h = (32 + id % 13).toInt
      val nf = (4 + id % 5).toInt
      val a = Decoder.mjpegFingerprint(id,
        Decoder.encodeTestMjpegAvi(id, w, h, nf, smooth = false)).get
      val b = Decoder.mjpegFingerprint(id,
        Decoder.encodeTestMjpegAvi(id, w, h, nf, bright = true,
          smooth = false)).get
      val bandsA = Array(a.b0, a.b1, a.b2, a.b3)
      val bandsB = Array(b.b0, b.b1, b.b2, b.b3)
      val hd = bandsA.zip(bandsB).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
      val shared = bandsA.zip(bandsB).count { case (x, y) => x == y }
      maxHd = math.max(maxHd, hd)
      minShared = math.min(minShared, shared)
      if (shared == 0 || hd > 12) missed += 1
      pairs += 1
    }
    println(f"[mjpeg-probe] near-dup: max Hamming=$maxHd  min shared " +
      f"bands=$minShared  missed(no band or hd>12)=$missed of $pairs")

    // (c) false positives among DISTINCT base ids under the (w,h,nf)
    // blocking key: band-collision pairs that also pass the verify
    val hashes = ids.take(n).map { id =>
      val w = (32 + id % 17).toInt; val h = (32 + id % 13).toInt
      val nf = (4 + id % 5).toInt
      val fp0 = Decoder.mjpegFingerprint(id,
        Decoder.encodeTestMjpegAvi(id, w, h, nf, smooth = false)).get
      ((w, h, nf), Array(fp0.b0, fp0.b1, fp0.b2, fp0.b3))
    }
    val byBand = scala.collection.mutable.HashMap
      .empty[((Int, Int, Int), Int, Long), List[Int]].withDefaultValue(Nil)
    hashes.zipWithIndex.foreach { case ((blk, bs), i) =>
      bs.zipWithIndex.foreach { case (v, bi) =>
        byBand((blk, bi, v)) = i :: byBand((blk, bi, v)) }
    }
    val candPairs = byBand.values.flatMap { l =>
      for (a <- l; b <- l if a < b) yield (a, b) }.toSet
    val fp = candPairs.count { case (i, j) =>
      val hd = hashes(i)._2.zip(hashes(j)._2).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
      hd <= 12
    }
    println(s"[mjpeg-probe] fp: ${candPairs.size} band-collision pairs " +
      s"among $n distinct ids, $fp pass hd<=12")
  }
}
