package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** VP8L decoder conformance (round 14). Anchoring strategy (the QOI
  * precedent, zero-egress): HAND-ASSEMBLED spec vectors — byte arrays
  * computed on paper from the spec's bit layout, NOT produced by the
  * repo's own encoder — plus roundtrips through [[Vp8l.syntheticWebpGray]]
  * whose six variants take different bitstream paths, plus a pinned
  * prefix of the derived distance map, plus corrupt-input posture. */
class Vp8lSpec extends AnyFunSuite {

  /** Independent LSB-first packer local to the test (deliberately not
    * [[Vp8l.BitWriter]]) for bit sequences transcribed from the spec. */
  private def pack(bits: Seq[Int]): Array[Byte] = {
    val out = new Array[Byte](((bits.length + 7) / 8))
    bits.zipWithIndex.foreach { case (b, i) =>
      if (b != 0) out(i / 8) = (out(i / 8) | (1 << (i % 8))).toByte
    }
    out
  }

  test("hand vector: 1x1 red pixel via simple single-symbol codes") {
    // Bytes computed on paper: sig 0x2F; 4 zero bytes = w-1(14)=0,
    // h-1(14)=0, alpha(1)=0, version(3)=0; then bits
    // [transforms=0, cache=0, meta=0,
    //  green : simple=1, nsym-1=0, 8bit=1, symbol 0 (8 bits),
    //  red   : 1, 0, 1, 0xFF,  blue: 1, 0, 1, 0x00,
    //  alpha : 1, 0, 1, 0xFF,  dist: 1, 0, 1, 0x00]
    // — all five codes are zero-bit, so the single pixel costs no bits.
    val payload = Array[Int](0x2F, 0x00, 0x00, 0x00, 0x00,
      0x28, 0x40, 0xFF, 0x0B, 0xD0, 0xFF, 0x02, 0x00).map(_.toByte)
    assert(Vp8l.decodeArgb(payload).map { case (w, h, px) => (w, h, px.toSeq) }
      === Some((1, 1, Seq(0xFFFF0000))))
    // and through RIFF framing + the gray path: luma of (255,0,0) = 76
    val gray = Vp8l.decodeGray(Vp8l.riffWrap(payload))
    assert(gray.map { case (w, h, px) => (w, h, px.toSeq) } === Some((1, 1, Seq(76))))
  }

  test("hand vector: 2x1 two-symbol simple green code, ascending listing") {
    // green simple 2-symbol code listing symbols 10 then 200: code 0
    // goes to the FIRST-LISTED symbol (libwebp's positional reading —
    // which coincides with canonical here because the listing is
    // ascending), so pixel bits [0, 1] decode to greens [10, 200].
    val bits = Seq(
      1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, // w-1 = 1
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, // h-1 = 0
      0, // alpha
      0, 0, 0, // version
      0, // no transforms
      0, // no cache
      0, // no meta
      1, 1, 1, 0, 1, 0, 1, 0, 0, 0, 0, // green: simple, 2 syms, 8-bit, 10
      0, 0, 0, 1, 0, 0, 1, 1, // second symbol 200
      1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, // red: single 0
      1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, // blue: single 0
      1, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, // alpha: single 255
      1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, // dist: single 0
      0, // pixel 0 → code 0 → green 10
      1) // pixel 1 → code 1 → green 200
    val payload = (0x2F.toByte +: pack(bits).toSeq).toArray
    assert(Vp8l.decodeArgb(payload).map { case (w, h, px) => (w, h, px.toSeq) }
      === Some((2, 1, Seq(0xFF000A00, 0xFF00C800))))
  }

  test("hand vector: 2x1 two-symbol simple code, DESCENDING listing") {
    // The discriminating case for listed-order vs canonical: symbols
    // 200 then 10. libwebp's decoder assigns code 0 positionally to
    // the first-listed symbol (200); the canonical reading would give
    // it to 10. Pixel bits [0, 1] must decode to greens [200, 10].
    val bits = Seq(
      1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, // w-1 = 1
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, // h-1 = 0
      0, // alpha
      0, 0, 0, // version
      0, // no transforms
      0, // no cache
      0, // no meta
      1, 1, 1, 0, 0, 0, 1, 0, 0, 1, 1, // green: simple, 2 syms, 8-bit, 200
      0, 1, 0, 1, 0, 0, 0, 0, // second symbol 10
      1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, // red: single 0
      1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, // blue: single 0
      1, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, // alpha: single 255
      1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, // dist: single 0
      0, // pixel 0 → code 0 → FIRST-listed green 200
      1) // pixel 1 → code 1 → green 10
    val payload = (0x2F.toByte +: pack(bits).toSeq).toArray
    assert(Vp8l.decodeArgb(payload).map { case (w, h, px) => (w, h, px.toSeq) }
      === Some((2, 1, Seq(0xFF00C800, 0xFF000A00))))
  }

  test("distance map: derivation matches the spec's printed prefix") {
    val expected = Seq(
      (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
      (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
      (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3))
    assert(Vp8l.distMap.length === 120)
    assert(Vp8l.distMap.take(30).toSeq === expected)
    // structural properties of the whole table: unique, in-range,
    // non-decreasing distance
    assert(Vp8l.distMap.distinct.length === 120)
    assert(Vp8l.distMap.forall { case (x, y) =>
      x >= -8 && x <= 8 && y >= 0 && y <= 8 })
    val ds = Vp8l.distMap.map { case (x, y) => x * x + y * y }
    assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
  }

  test("lz77 prefix coding: encode/decode inverse across the range") {
    // the encoder's (code, extraBits, extra) must reproduce v under the
    // spec formula for every length/distance value the streams use
    (1 to 5000).foreach { v =>
      val (c, eb, extra) = Vp8l.lz77Encode(v)
      val back =
        if (c < 4) c + 1
        else ((2 + (c & 1)) << ((c - 2) >> 1)) + extra + 1
      assert(back === v, s"v=$v code=$c eb=$eb extra=$extra")
      if (c >= 4) assert(extra < (1 << eb))
    }
  }

  test("roundtrip: all six encoder variants reproduce the pixels") {
    val gray = Array.tabulate(18 * 16) { i =>
      val x = i % 18; val y = i / 18
      (7 * 31 + x * 7 + y * 13) % 176 + (if (x < 2 && y < 2) 80 else 0)
    }
    (0 to 5).foreach { v =>
      val webp = Vp8l.syntheticWebpGray(18, 16, gray, v)
      val out = Vp8l.decodeGray(webp)
      assert(out.isDefined, s"variant $v failed to decode")
      val (w, h, px) = out.get
      assert((w, h) === (18, 16), s"variant $v dims")
      assert(px.toSeq === gray.toSeq, s"variant $v pixels")
      // and the shared dispatch hashes it like any other container
      assert(Multimodal.imageHashOf(webp).isDefined, s"variant $v hash")
    }
  }

  test("roundtrip: odd geometries and value extremes") {
    for ((w, h) <- Seq((9, 8), (33, 5), (18, 16), (13, 21))) {
      val gray = Array.tabulate(w * h)(i => (i * 97 + 5) % 256)
      for (v <- Seq(0, 1, 2, 3, 5)) { // palette variant needs ≤256 distinct ✓ but >16 — keep it out of tiny sets
        val webp = Vp8l.syntheticWebpGray(w, h, gray, v)
        val out = Vp8l.decodeGray(webp)
        assert(out.map(_._3.toSeq) === Some(gray.toSeq), s"($w x $h) variant $v")
      }
    }
    // all-equal image: cache variant hits constantly, lz77 copies constantly
    val flat = Array.fill(18 * 16)(200)
    for (v <- Seq(0, 1, 2, 3, 5))
      assert(Vp8l.decodeGray(Vp8l.syntheticWebpGray(18, 16, flat, v))
        .map(_._3.toSeq) === Some(flat.toSeq), s"flat variant $v")
  }

  test("hand vector: backward reference before the first pixel is corrupt") {
    // green normal code with lengths {256→1, 257→1}: bit 0 decodes to
    // symbol 256 = length code 0 = copy length 1, but pos = 0 → None.
    val bw = new Vp8l.BitWriter
    bw.putBits(0x2F, 8).putBits(0, 14).putBits(0, 14).putBits(0, 1).putBits(0, 3)
    bw.putBits(0, 1).putBits(0, 1).putBits(0, 1) // transforms, cache, meta
    val lens = new Array[Int](280); lens(256) = 1; lens(257) = 1
    val gc = Vp8l.writeNormalCode(bw, lens)
    Vp8l.writeSingleCode(bw, 0) // red
    Vp8l.writeSingleCode(bw, 0) // blue
    Vp8l.writeSingleCode(bw, 0) // alpha
    Vp8l.writeSingleCode(bw, 0) // dist
    val (c, l) = gc(256); bw.putCode(c, l)
    assert(Vp8l.decodeArgb(bw.toBytes) === None)
  }

  test("hand vector: over-subscribed prefix code is corrupt") {
    // a zero-bit code-length tree (only token 1 has nonzero length)
    // expands to all-ones lengths over the whole 280 alphabet —
    // Kraft-violating, must be rejected, never decoded ambiguously
    val bits = Seq(
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, // w-1 = 0
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, // h-1 = 0
      0, 0, 0, 0, // alpha + version
      0, 0, 0, // transforms, cache, meta
      0, // green: normal form
      0, 0, 0, 0, // num_codes - 4 = 0 → 4 entries: order 17, 18, 0, 1
      0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, // 3-bit lengths: 0, 0, 0, 1
      0) // no max_symbol shortcut; token stream then reads zero bits
    val payload = (0x2F.toByte +: pack(bits).toSeq).toArray
    assert(Vp8l.decodeArgb(payload) === None)
  }

  test("corrupt posture: version, truncation, lossy flavor, garbage") {
    val gray = Array.tabulate(18 * 16)(i => (i * 7) % 176)
    val good = Vp8l.syntheticWebpGray(18, 16, gray, 0)
    // version bits != 0 → None (byte 4 of the payload holds version MSBs)
    val badVer = good.clone()
    badVer(20 + 4) = (badVer(20 + 4) | 0x80).toByte // RIFF(12)+hdr(8) = payload at 20
    assert(Vp8l.decodeGray(badVer) === None)
    // truncations at every eighth byte: Option, never a throw
    (1 until good.length by 8).foreach { n =>
      Vp8l.decodeGray(java.util.Arrays.copyOf(good, n))
    }
    // a lossy VP8 chunk is not ours
    val lossy = good.clone()
    lossy(15) = ' '.toByte // "VP8L" → "VP8 "
    assert(!Vp8l.isWebpLossless(lossy) && Vp8l.decodeGray(lossy) === None)
    assert(Vp8l.decodeGray(Array.fill[Byte](64)(0x2F)) === None)
    assert(Vp8l.decodeGray(null) === None)
    assert(Vp8l.decodeGray(Array.emptyByteArray) === None)
  }

  private def single(bw: Vp8l.BitWriter, g: Int, r: Int, b: Int, a: Int, d: Int): Unit = {
    Vp8l.writeSingleCode(bw, g); Vp8l.writeSingleCode(bw, r)
    Vp8l.writeSingleCode(bw, b); Vp8l.writeSingleCode(bw, a)
    Vp8l.writeSingleCode(bw, d)
  }

  test("meta prefix codes: two spatial groups select different code sets") {
    // 8x4, metaBits 2 → huffman image 2x1: columns 0-3 take group 0
    // (constant r=7,g=3,b=1), columns 4-7 group 1 (r=9,g=2,b=4); all
    // five codes per group are zero-bit, so group SELECTION is the only
    // thing that can produce the split — and the non-gray channels pin
    // the r/g/b assignment.
    val bw = new Vp8l.BitWriter
    bw.putBits(0x2F, 8).putBits(7, 14).putBits(3, 14).putBits(0, 1).putBits(0, 3)
    bw.putBits(0, 1) // no transforms
    bw.putBits(0, 1) // no color cache
    bw.putBits(1, 1).putBits(0, 3) // meta prefix, subsample bits = 2
    // meta sub-image 2x1: cache 0, green simple 2-symbol {0,1}, rest single
    bw.putBits(0, 1)
    bw.putBits(1, 1).putBits(1, 1).putBits(1, 1).putBits(0, 8).putBits(1, 8) // green {0,1}
    Vp8l.writeSingleCode(bw, 0); Vp8l.writeSingleCode(bw, 0)
    Vp8l.writeSingleCode(bw, 255); Vp8l.writeSingleCode(bw, 0)
    bw.putBits(0, 1).putBits(1, 1) // meta pixels: group 0, group 1
    single(bw, g = 3, r = 7, b = 1, a = 255, d = 0) // group 0 codes
    single(bw, g = 2, r = 9, b = 4, a = 255, d = 0) // group 1 codes
    // main pixels cost zero bits
    val out = Vp8l.decodeArgb(bw.toBytes)
    assert(out.isDefined)
    val (w, h, px) = out.get
    assert((w, h) === (8, 4))
    val g0 = 0xFF000000 | (7 << 16) | (3 << 8) | 1
    val g1 = 0xFF000000 | (9 << 16) | (2 << 8) | 4
    assert(px.toSeq === (0 until 32).map(i => if (i % 8 < 4) g0 else g1))
  }

  test("color transform: signed multipliers, reconstructed-red feeds blue") {
    // 4x1, size_bits 2 → one CTE block. cte channels: blue=green_to_red,
    // green=green_to_blue, red=red_to_blue. delta(t, c) = (int8 t *
    // int8 c) >> 5 added on decode.
    def build(g2r: Int, g2b: Int, r2b: Int, sr: Int, sg: Int, sb0: Int): Array[Int] = {
      val bw = new Vp8l.BitWriter
      bw.putBits(0x2F, 8).putBits(3, 14).putBits(0, 14).putBits(0, 1).putBits(0, 3)
      bw.putBits(1, 1).putBits(1, 2) // transform: color
      bw.putBits(0, 3) // size_bits = 2
      bw.putBits(0, 1) // sub-image: no cache
      single(bw, g = g2b, r = r2b, b = g2r, a = 255, d = 0)
      bw.putBits(0, 1) // end of transforms
      bw.putBits(0, 1).putBits(0, 1) // main: no cache, no meta
      single(bw, g = sg, r = sr, b = sb0, a = 255, d = 0)
      Vp8l.decodeArgb(bw.toBytes).get._3
    }
    // g2r = 16, g = 64: delta = (16*64)>>5 = 32 → r = 100+32 = 132
    val px1 = build(g2r = 16, g2b = 0, r2b = 0, sr = 100, sg = 64, sb0 = 50)
    assert(px1.toSeq === Seq.fill(4)(0xFF000000 | (132 << 16) | (64 << 8) | 50))
    // g2r = 240 (int8 -16): delta = (-16*64)>>5 = -32 → r = 68; then
    // r2b = 32 uses the RECONSTRUCTED red 68 (int8 68): (32*68)>>5 = 68
    // → b = (50 + 68) = 118
    val px2 = build(g2r = 240, g2b = 0, r2b = 32, sr = 100, sg = 64, sb0 = 50)
    assert(px2.toSeq === Seq.fill(4)(0xFF000000 | (68 << 16) | (64 << 8) | 118))
  }

  test("bundled palette: 4-color 2-bit pixel packing unbundles") {
    // 8x2 with palette {10,20,30,40} gray → packBits 2, packed width 2;
    // indices row0 [0,1,2,3,3,2,1,0], row1 [1,1,0,0,3,3,2,2] pack
    // LSB-first within each green byte.
    val bw = new Vp8l.BitWriter
    bw.putBits(0x2F, 8).putBits(7, 14).putBits(1, 14).putBits(0, 1).putBits(0, 3)
    bw.putBits(1, 1).putBits(3, 2) // transform: color indexing
    bw.putBits(3, 8) // palette size - 1
    // palette sub-image 4x1 of per-channel deltas: first 0xFF0A0A0A then
    // 0x000A0A0A x3 — greens/reds/blues all 10, alphas {255, 0, 0, 0}
    bw.putBits(0, 1) // no cache
    Vp8l.writeSingleCode(bw, 10); Vp8l.writeSingleCode(bw, 10)
    Vp8l.writeSingleCode(bw, 10)
    bw.putBits(1, 1).putBits(1, 1).putBits(1, 1).putBits(0, 8).putBits(255, 8) // alpha {0,255}
    Vp8l.writeSingleCode(bw, 0)
    bw.putBits(1, 1).putBits(0, 1).putBits(0, 1).putBits(0, 1) // alpha bits: 255,0,0,0 → codes 1,0,0,0
    bw.putBits(0, 1) // end of transforms
    // main image 2x2 (packed): greens [228, 27, 5, 175]
    bw.putBits(0, 1).putBits(0, 1) // no cache, no meta
    val lens = new Array[Int](280)
    Seq(228, 27, 5, 175).foreach(lens(_) = 2)
    val gc = Vp8l.writeNormalCode(bw, lens)
    Vp8l.writeSingleCode(bw, 0); Vp8l.writeSingleCode(bw, 0)
    Vp8l.writeSingleCode(bw, 255); Vp8l.writeSingleCode(bw, 0)
    Seq(228, 27, 5, 175).foreach { g => val (c, l) = gc(g); bw.putCode(c, l) }
    val out = Vp8l.decodeArgb(bw.toBytes)
    assert(out.isDefined)
    val (w, h, px) = out.get
    assert((w, h) === (8, 2))
    def p(v: Int) = 0xFF000000 | (v << 16) | (v << 8) | v
    assert(px.toSeq === Seq(10, 20, 30, 40, 40, 30, 20, 10,
      20, 20, 10, 10, 40, 40, 30, 30).map(p))
  }

  test("predictor mode 11 (Select): hand-computed 2x2") {
    // targets: (5,5,5), (7,7,7) / (9,9,9), (8,8,8); block mode 11.
    // (1,1): p = L+T-TL = 11 per color channel; pL = 3*|11-9| = 6,
    // pT = 3*|11-7| = 12 → pL <= pT → predict L = 9 → residual 255.
    val bw = new Vp8l.BitWriter
    bw.putBits(0x2F, 8).putBits(1, 14).putBits(1, 14).putBits(0, 1).putBits(0, 3)
    bw.putBits(1, 1).putBits(0, 2) // transform: predictor
    bw.putBits(0, 3) // size_bits 2 → one block
    bw.putBits(0, 1) // sub-image: no cache
    single(bw, g = 11, r = 0, b = 0, a = 255, d = 0) // mode in green
    bw.putBits(0, 1) // end of transforms
    bw.putBits(0, 1).putBits(0, 1) // main: no cache, no meta
    val lens = new Array[Int](280)
    Seq(5, 2, 4, 255).foreach(lens(_) = 2)
    val gc = Vp8l.writeNormalCode(bw, lens)
    val lensC = new Array[Int](256)
    Seq(5, 2, 4, 255).foreach(lensC(_) = 2)
    val rc = Vp8l.writeNormalCode(bw, lensC)
    val bc = Vp8l.writeNormalCode(bw, lensC)
    Vp8l.writeSingleCode(bw, 0) // alpha residual 0 everywhere
    Vp8l.writeSingleCode(bw, 0) // dist
    // residuals per pixel (g, r, b all equal): 5, 2, 4, 255
    Seq(5, 2, 4, 255).foreach { v =>
      val (cg, lg) = gc(v); bw.putCode(cg, lg)
      val (cr, lr) = rc(v); bw.putCode(cr, lr)
      val (cb, lb) = bc(v); bw.putCode(cb, lb)
    }
    val out = Vp8l.decodeArgb(bw.toBytes)
    assert(out.isDefined)
    def p(v: Int) = 0xFF000000 | (v << 16) | (v << 8) | v
    assert(out.get._3.toSeq === Seq(p(5), p(7), p(9), p(8)))
  }

  test("predictor mode 11 (Select): TIE goes to TOP, not left") {
    // targets: (8,8,8), (7,7,7) / (9,9,9), (20,20,20); block mode 11.
    // (1,1): p = L+T-TL = 9+7-8 = 8 per color channel (alpha: 255).
    // pL = 3*|8-9| = 3, pT = 3*|8-7| = 3 → TIE → libwebp predicts the
    // TOP pixel 7 → residual 13 yields 20. A left-on-tie decoder would
    // produce 22 here.
    val bw = new Vp8l.BitWriter
    bw.putBits(0x2F, 8).putBits(1, 14).putBits(1, 14).putBits(0, 1).putBits(0, 3)
    bw.putBits(1, 1).putBits(0, 2) // transform: predictor
    bw.putBits(0, 3) // size_bits 2 → one block
    bw.putBits(0, 1) // sub-image: no cache
    single(bw, g = 11, r = 0, b = 0, a = 255, d = 0) // mode in green
    bw.putBits(0, 1) // end of transforms
    bw.putBits(0, 1).putBits(0, 1) // main: no cache, no meta
    val lens = new Array[Int](280)
    Seq(8, 255, 1, 13).foreach(lens(_) = 2)
    val gc = Vp8l.writeNormalCode(bw, lens)
    val lensC = new Array[Int](256)
    Seq(8, 255, 1, 13).foreach(lensC(_) = 2)
    val rc = Vp8l.writeNormalCode(bw, lensC)
    val bc = Vp8l.writeNormalCode(bw, lensC)
    Vp8l.writeSingleCode(bw, 0) // alpha residual 0 everywhere
    Vp8l.writeSingleCode(bw, 0) // dist
    // residuals per pixel (g, r, b all equal): 8, 255, 1, 13
    Seq(8, 255, 1, 13).foreach { v =>
      val (cg, lg) = gc(v); bw.putCode(cg, lg)
      val (cr, lr) = rc(v); bw.putCode(cr, lr)
      val (cb, lb) = bc(v); bw.putCode(cb, lb)
    }
    val out = Vp8l.decodeArgb(bw.toBytes)
    assert(out.isDefined)
    def p(v: Int) = 0xFF000000 | (v << 16) | (v << 8) | v
    assert(out.get._3.toSeq === Seq(p(8), p(7), p(9), p(20)))
  }

  test("animated webp: compositing model hand-checked against array math") {
    val cw = 18; val ch = 16; val bg = 10
    val f0 = Array.tabulate(cw * ch)(i => (31 + (i % cw) * 7 + (i / cw) * 13) % 176)
    val f1 = Array.tabulate(8 * 6)(i => (5 + (i % 8) * 11 + (i / 8) * 3) % 200)
    val f2 = Array.tabulate(6 * 4)(i => (9 + (i % 6) * 5 + (i / 6) * 7) % 150)
    val f3 = Array.tabulate(4 * 4)(i => (2 + (i % 4) * 9 + (i / 4) * 2) % 120)
    val webp = Vp8l.syntheticWebpAnim(cw, ch, bg, Seq(
      (0, 0, cw, ch, f0, 255, false, false, 0), // full keyframe, overwrite
      (4, 6, 8, 6, f1, 255, false, false, 1), // sub-rect overwrite
      (2, 2, 6, 4, f2, 255, false, true, 2), // dispose-to-background after
      (12, 2, 4, 4, f3, 128, true, false, 3))) // semi-transparent src-over
    val out = Vp8l.decodeAnimFramesSampled(webp, 12)
    assert(out.isDefined)
    val (w, h, frames) = out.get
    assert((w, h) === (cw, ch) && frames.map(_._1) === Seq(0, 1, 2, 3))
    // independent expected-canvas math (plain array ops, not the decoder)
    def inRect(x: Int, y: Int, rx: Int, ry: Int, rw: Int, rh: Int) =
      x >= rx && x < rx + rw && y >= ry && y < ry + rh
    val exp = Array.tabulate(4) { fi =>
      Array.tabulate(cw * ch) { i =>
        val x = i % cw; val y = i / cw
        val a = f0(i)
        if (fi == 0) a
        else if (inRect(x, y, 4, 6, 8, 6)) f1((y - 6) * 8 + (x - 4))
        else if (fi >= 2 && inRect(x, y, 2, 2, 6, 4)) {
          if (fi == 2) f2((y - 2) * 6 + (x - 2)) else bg // disposed after frame 2
        }
        else if (fi == 3 && inRect(x, y, 12, 2, 4, 4))
          (f3((y - 2) * 4 + (x - 12)) * 128 + a * 127) / 255
        else a
      }
    }
    frames.foreach { case (fi, luma) =>
      assert(luma.toSeq === exp(fi).toSeq, s"frame $fi composite")
    }
    // the video hash family picks it up through the shared dispatch
    assert(Multimodal.videoHashesOf(webp, 12).nonEmpty)
    // sampling contract: 7 frames at sampleFrames 3 → indices 0, 2, 4
    val seven = Vp8l.syntheticWebpAnim(10, 9, 0,
      (0 until 7).map(i => (0, 0, 10, 9, Array.fill(90)((i * 20) % 256), 255, false, false, 0)))
    assert(Vp8l.decodeAnimFramesSampled(seven, 3).get._3.map(_._1) === Seq(0, 2, 4))
  }

  test("animated webp: lossy frames, bad geometry, stills all refuse") {
    val ok = Vp8l.syntheticWebpAnim(10, 9, 0,
      Seq((0, 0, 10, 9, Array.fill(90)(50), 255, false, false, 0)))
    assert(Vp8l.isWebpAnim(ok))
    assert(Vp8l.decodeAnimFramesSampled(ok, 4).isDefined)
    // a VP8 (lossy) frame payload: structural walk fine, content → None
    val lossy = ok.clone()
    val at = ok.indexOfSlice("VP8L".getBytes("ISO-8859-1"), 30)
    lossy(at + 3) = ' '.toByte
    assert(Vp8l.decodeAnimFramesSampled(lossy, 4) === None)
    // a frame escaping the canvas → None
    val esc = Vp8l.syntheticWebpAnim(10, 9, 0,
      Seq((6, 0, 10, 9, Array.fill(90)(50), 255, false, false, 0)))
    assert(Vp8l.decodeAnimFramesSampled(esc, 4) === None)
    // stills are not animations
    assert(!Vp8l.isWebpAnim(Vp8l.syntheticWebpGray(9, 8,
      Array.tabulate(72)(_ % 176), 0)))
    assert(Vp8l.decodeAnimFramesSampled(null, 4) === None)
  }

  test("imageGrayOf dispatch: webp joins the container-invariant family") {
    // the same pixels through QOI and VP8L must hash identically —
    // container invariance is what makes cross-format near-dup work
    val gray = Array.tabulate(18 * 16) { i =>
      val x = i % 18; val y = i / 18
      (3 * 31 + x * 7 + y * 13) % 176
    }
    val viaQoi = Multimodal.imageHashOf(Multimodal.syntheticQoi(18, 16, gray))
    (0 to 5).foreach { v =>
      val viaWebp = Multimodal.imageHashOf(Vp8l.syntheticWebpGray(18, 16, gray, v))
      assert(viaWebp === viaQoi, s"variant $v")
    }
  }
}
