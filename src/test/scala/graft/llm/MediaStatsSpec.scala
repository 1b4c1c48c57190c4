package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Image/video curation stats (round 13): hand-computed signals,
  * cross-container identity, undecodable-row accounting. */
class MediaStatsSpec extends AnyFunSuite {

  test("image stats: hand case, container identity, undecodable row") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    // 4x2: [10 10 50 200 / 10 240 240 240], defaults dark<32 bright>223 edge>=8
    val px = Array(10, 10, 50, 200, 10, 240, 240, 240)
    val bmp = Multimodal.syntheticBmpPixels(4, 2, px)
    val one = ImageStats.stats(
      spark.createDataset(Seq(Multimodal.Media(1L, bmp, "image/bmp")))).collect().head
    assert(one.n_px == 8 && one.mean_luma == px.sum / 8)
    assert(one.min_luma == 10 && one.max_luma == 240)
    assert(one.dark == 3 && one.bright == 3, "dark <32 three times; bright >223 three")
    assert(one.edges == 3, "|Δ| >= 8 pairs: 10→50, 50→200, 10→240; no row-wrap pair")
    // the same pixels through a real PNG score identically
    val png = Multimodal.syntheticPngPixels(4, 2, px)
    val two = ImageStats.stats(
      spark.createDataset(Seq(Multimodal.Media(2L, png, "image/png")))).collect().head
    assert(two.copy(doc_id = 1L) == one, "stats are container-blind")
    val junk = ImageStats.stats(
      spark.createDataset(Seq(Multimodal.Media(3L, "nope".getBytes, "image/bmp")))).collect().head
    assert(junk.n_px == 0, "undecodable input keeps its row")
  }

  test("vad segments: hangover merge, hard boundary, tail drop, codec identity") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    // frame grid of 4 samples; energies per frame: [300, 0, 300, 0, 0, 300, 300]
    // + a 2-sample tail (dropped). With thresh 200, mergeGap 1: frames 0-2
    // merge across the single-frame stop; the 2-frame silence splits; one
    // segment of frames 5-6 follows.
    def wav(frames: Seq[Int], tail: Int): Array[Byte] =
      Multimodal.syntheticWavPcm(8000,
        (frames.flatMap(a => Seq.fill(4)(a)) ++ Seq.fill(tail)(999)).toArray)
    val b = wav(Seq(300, 0, 300, 0, 0, 300, 300), tail = 2)
    val segs = AudioStats.vadSegments(
      spark.createDataset(Seq(Multimodal.Media(1L, b, "audio/wav"))),
      frameLen = 4, energyThresh = 200, mergeGap = 1).collect().sortBy(_.seg_idx)
    assert(segs.length == 2)
    assert((segs(0).start_frame, segs(0).end_frame, segs(0).n_frames, segs(0).n_active)
      == (0L, 2L, 3L, 2L), "hangover bridges the one-frame stop")
    assert((segs(1).start_frame, segs(1).end_frame, segs(1).n_active) == (5L, 6L, 2L),
      "two-frame silence is a boundary; the 999-sample tail is off-grid")
    // ms bounds on the 8 kHz grid: 4 samples = 0.5 ms per frame
    assert(segs(0).start_ms == 0L && segs(0).end_ms == 3L * 4 * 1000 / 8000)
    // mergeGap 0: the one-frame stop also splits → 3 segments
    val strict = AudioStats.vadSegments(
      spark.createDataset(Seq(Multimodal.Media(1L, b, "audio/wav"))),
      frameLen = 4, energyThresh = 200, mergeGap = 0).collect()
    assert(strict.length == 3)
    // the same samples through FLAC segment identically (shared decode)
    val flacB = Flac.synthetic(8000,
      (Seq(300, 0, 300, 0, 0, 300, 300).flatMap(a => Seq.fill(4)(a)) ++ Seq(999, 999)).toArray)
    val viaFlac = AudioStats.vadSegments(
      spark.createDataset(Seq(Multimodal.Media(1L, flacB, "audio/flac"))),
      frameLen = 4, energyThresh = 200, mergeGap = 1).collect().sortBy(_.seg_idx)
    assert(viaFlac.toSeq == segs.toSeq, "VAD is container-blind")
    // all-silent and undecodable audio emit nothing
    assert(AudioStats.vadSegments(spark.createDataset(Seq(
      Multimodal.Media(2L, wav(Seq(0, 0, 0), 0), "audio/wav"),
      Multimodal.Media(3L, "junk".getBytes, "audio/wav"))),
      frameLen = 4, energyThresh = 200).count() == 0L)
  }

  test("video scene cuts: hand case and container identity") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val w = 18; val h = 16
    // frames 0-1 share a gradient, frames 2-3 a rewritten one: exactly 1 cut
    def frame(sc: Int): Array[Int] = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (x * (7 + sc * 5) + y * (13 + sc * 7) + sc * 31) % 176
    }
    val frames = Seq(frame(0), frame(0), frame(1), frame(1))
    val y4m = Multimodal.Media(1L, Multimodal.syntheticY4m(w, h, frames), "video/x-yuv4mpeg")
    val gif = Multimodal.Media(2L, Multimodal.syntheticGifAnimated(w, h, frames), "image/gif")
    val got = VideoStats.sceneCuts(spark.createDataset(Seq(y4m, gif)), sampleFrames = 4)
      .collect().sortBy(_.doc_id)
    assert(got(0).n_frames == 4 && got(0).n_cuts == 1,
      s"one scene boundary (sum_hamming=${got(0).sum_hamming})")
    assert(got(0).sum_hamming >= 16, "the cut accounts for all the churn")
    assert(got(1).copy(doc_id = 1L) == got(0), "Y4M and GIF containers agree")
    // a static video scores zero churn
    val static = VideoStats.sceneCuts(spark.createDataset(Seq(Multimodal.Media(3L,
      Multimodal.syntheticY4m(w, h, Seq(frame(0), frame(0), frame(0))), "video/x-yuv4mpeg"))),
      sampleFrames = 3).collect().head
    assert(static.n_cuts == 0 && static.sum_hamming == 0, "static screens score zero")
    val junk = VideoStats.sceneCuts(spark.createDataset(Seq(
      Multimodal.Media(4L, "not video".getBytes, "video/x-yuv4mpeg")))).collect().head
    assert(junk.n_frames == 0, "undecodable input keeps its row")
  }

  // ------------------------------------------------------------------
  // Spectral fingerprint (round 15)
  // ------------------------------------------------------------------

  test("whtInPlace matches the direct popcount formula; Walsh tones concentrate") {
    // direct O(n²) reference vs the butterfly, on a deterministic ramp mix
    val x = Array.tabulate(64)(j => ((j * 37 + 11) % 97 - 48).toLong)
    val direct = Array.tabulate(64) { m =>
      (0 until 64).map(j =>
        if (java.lang.Integer.bitCount(m & j) % 2 == 0) x(j) else -x(j)).sum
    }
    val fast = x.clone()
    AudioStats.whtInPlace(fast)
    assert(fast.sameElements(direct), "butterfly is the natural-order WHT")
    // Parseval for the ±1-normalized WHT: Σ wht² = n · Σ x²
    assert(fast.map(v => v * v).sum == 64L * x.map(v => v * v).sum)
    // a Walsh tone a·(−1)^popcount(k&j) puts 64a at coefficient k alone
    for (k <- Seq(1, 7, 33)) {
      val tone = Array.tabulate(64)(j =>
        if (java.lang.Integer.bitCount(k & j) % 2 == 0) 20L else -20L)
      AudioStats.whtInPlace(tone)
      assert(tone(k) == 64L * 20, s"k=$k concentrates")
      assert(tone.zipWithIndex.forall { case (v, i) => i == k || v == 0L },
        s"k=$k: every other coefficient is zero")
    }
  }

  test("spectral hashes: hand case, volume invariance, refusal posture") {
    def walshFrame(k: Int, a: Int): Array[Int] = Array.tabulate(64)(j =>
      if (java.lang.Integer.bitCount(k & j) % 2 == 0) a else -a)
    // frame 0: tone at band 5; frame 1: tone at band 9 — the double
    // difference by hand: e1 only at k1=9, e0 only at k0=5, so
    // D(m)=e1·([m+1=9]−[m+2=9]) − e0·([m+1=5]−[m+2=5]) is positive at
    // m=8 (+e1) and m=3 (+e0... sign: −e0·(−1)=+e0 at m=3) — bits 8 and 3
    val s = walshFrame(5, 50) ++ walshFrame(9, 70)
    val got = AudioStats.spectralHashes(s, 64)
    assert(got.map(_._1) == Seq(1), "first frame only primes")
    assert(got.head._2 == ((1L << 8) | (1L << 3)),
      f"hand bits 8 and 3, got ${got.head._2}%x")
    // uniform gain leaves every sign bit untouched
    val loud = s.map(_ * 3)
    assert(AudioStats.spectralHashes(loud, 64) == got, "volume-invariant")
    assert(AudioStats.spectralHashes(new Array[Int](64), 64).isEmpty,
      "one frame is not enough")
    assert(AudioStats.spectralHashes(new Array[Int](0), 64).isEmpty)
    // end-to-end through the WAV container + the Dataset kernel
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val media = Seq(
      Multimodal.Media(1L, Multimodal.syntheticWavPcm(8000, s), "audio/wav"),
      Multimodal.Media(2L, "not audio".getBytes, "audio/wav"))
    val rows = AudioStats.spectralFingerprint(spark.createDataset(media))
      .collect().toSeq
    assert(rows == Seq(AudioStats.SpectralFrame(1L, 1, (1L << 8) | (1L << 3))),
      "container round-trip; undecodable bytes yield no rows")
  }
}
