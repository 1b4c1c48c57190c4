package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec roundtrips: every subframe type, residual method, stereo
  * decorrelation mode, and framing edge the decoder supports is driven
  * through the real encoder, and the decoded samples must equal the
  * input EXACTLY (FLAC is lossless — any off-by-one in rice/zigzag/
  * predictors/CRC framing fails loudly). */
class FlacSpec extends AnyFunSuite {

  private def wave(n: Int, seed: Int): Array[Int] =
    Array.tabulate(n) { j =>
      // structured + noisy: exercises non-trivial residuals at every order
      val s = (seed * 17 + j * 31) % 4001 - 2000
      s + (math.sin(j / 9.0) * 300).toInt
    }

  private val strategies =
    Seq("constant", "verbatim", "fixed0", "fixed1", "fixed2", "fixed3",
      "fixed4", "lpc2", "escape", "part2")

  for (strat <- strategies) {
    test(s"mono roundtrip, strategy $strat") {
      val s = wave(1950, 7)
      val bytes = Flac.synthetic(8000, s, blockSize = 256, strategy = strat)
      val Some((rate, ch, got)) = Flac.decodePcm(bytes)
      assert((rate, ch) == (8000, 1))
      assert(got.sameElements(s))
    }
  }

  test("constant strategy on a truly constant signal uses CONSTANT subframes") {
    val s = Array.fill(600)(1234)
    val const = Flac.synthetic(8000, s, blockSize = 200, strategy = "constant")
    val verb = Flac.synthetic(8000, s, blockSize = 200, strategy = "verbatim")
    assert(const.length < verb.length / 4) // constant must be tiny vs 16 bits/sample
    assert(Flac.decodePcm(const).get._3.sameElements(s))
  }

  for (stereo <- Seq("independent", "leftside", "rightside", "midside")) {
    test(s"stereo roundtrip, $stereo decorrelation") {
      val l = wave(1000, 3)
      val r = wave(1000, 11)
      val inter = Array.tabulate(2000)(i => if (i % 2 == 0) l(i / 2) else r(i / 2))
      val bytes = Flac.synthetic(16000, inter, blockSize = 250,
        strategy = "fixed2", channels = 2, stereo = stereo)
      val Some((rate, ch, mono)) = Flac.decodePcm(bytes)
      assert((rate, ch) == (16000, 2))
      // decodePcm downmixes like decodeWavPcm: (l + r) / 2 in Int math
      val expected = Array.tabulate(1000)(i => (l(i) + r(i)) / 2)
      assert(mono.sameElements(expected))
    }
  }

  test("ragged tail: stream length not a multiple of the block size") {
    val s = wave(1013, 5) // prime-ish → last frame is 1013 % 250 = 13 samples
    val bytes = Flac.synthetic(8000, s, blockSize = 250, strategy = "fixed1")
    assert(Flac.decodePcm(bytes).get._3.sameElements(s))
  }

  test("many frames: multi-byte UTF-8-coded frame numbers decode") {
    val s = wave(16 * 200, 9)
    val bytes = Flac.synthetic(44100, s, blockSize = 16, strategy = "fixed1")
    // 200 frames → frame numbers cross the 1-byte/2-byte coding boundary at 128
    assert(Flac.decodePcm(bytes).get._3.sameElements(s))
  }

  test("FLAC and WAV of the same recording produce the same envelope hash") {
    val s = wave(1950, 7)
    val wav = Multimodal.syntheticWavPcm(8000, s)
    val flac = Flac.synthetic(8000, s, blockSize = 256, strategy = "fixed2")
    val hw = Multimodal.audioHashOf(wav)
    val hf = Multimodal.audioHashOf(flac)
    assert(hw.isDefined && hw == hf)
  }

  test("truncation stops at the last whole frame, never throws") {
    val s = wave(1000, 13)
    val bytes = Flac.synthetic(8000, s, blockSize = 250, strategy = "fixed2")
    val cut = bytes.take(bytes.length - 40) // clip inside the final frame
    val got = Flac.decodePcm(cut)
    assert(got.isDefined)
    val mono = got.get._3
    assert(mono.length % 250 == 0 && mono.length < 1000)
    assert(mono.sameElements(s.take(mono.length)))
  }

  test("corrupt inputs return None, never throw") {
    assert(Flac.decodePcm(null).isEmpty)
    assert(Flac.decodePcm(Array[Byte]('f', 'L', 'a', 'C')).isEmpty)
    val good = Flac.synthetic(8000, wave(600, 1), blockSize = 200)
    assert(Flac.decodePcm(good.take(30)).isEmpty) // inside STREAMINFO
    val badMagic = good.clone(); badMagic(0) = 'g'
    assert(Flac.decodePcm(badMagic).isEmpty)
    // flip a bit inside the first frame body: CRC-16 must reject it,
    // and with only damaged frames the decode reports None
    val flipped = good.clone(); flipped(60) = (flipped(60) ^ 0x10).toByte
    val out = Flac.decodePcm(flipped)
    assert(out.isEmpty || out.get._3.length < 600)
  }

  test("a header CRC-8 mismatch rejects the frame") {
    val good = Flac.synthetic(8000, wave(600, 2), blockSize = 600)
    // frame starts right after fLaC(4) + block header(4) + STREAMINFO(34) = byte 42;
    // byte 42+4 sits in the frame header (blocksize field)
    val bad = good.clone(); bad(46) = (bad(46) ^ 1).toByte
    assert(Flac.decodePcm(bad).isEmpty)
  }
}
