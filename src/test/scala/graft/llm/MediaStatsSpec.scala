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
}
