package graft.llm

/** WebP-lossless (VP8L) pixel decode (round 14): the last commonly-hit
  * image format in a web scrape without content hashing here — the
  * [[Containers.parseWebp]] walk classifies WebP structurally, and this
  * decoder closes the gap for the LOSSLESS flavor so near-dup detection
  * sees pixels, not just dimensions.
  *
  * Why VP8L passes the COVERAGE.md decision-record bar where MP3 did
  * not (the round-13 declined-with-cause precedent): every table the
  * bitstream needs is CARRIED BY THE STREAM or closed-form —
  *  - prefix codes are canonical Huffman built from code lengths read
  *    out of the stream (the FLAC/PNG argument, verbatim);
  *  - the four transforms (predictor, color, subtract-green, color
  *    indexing) are closed-form arithmetic in the spec text;
  *  - the only fixed tables are the 19-entry code-length-code ORDER
  *    (a permutation spelled out in the spec prose, not a data annex)
  *    and the 120-entry close-neighbor distance map, which this file
  *    DERIVES from its generative rule (sort the (dx, dy) neighborhood
  *    by distance) rather than transcribing — see [[distMap]].
  *
  * Spec basis: the public "WebP Lossless Bitstream Specification"
  * (RFC 9649 / developers.google.com) and RIFF framing per
  * [[Containers.parseWebp]]. All bit reads are LSB-first within bytes;
  * prefix-code bits accumulate MSB-of-code-first (the DEFLATE
  * convention the spec shares).
  *
  * Honesty note (zero-egress discipline): with no libwebp in the
  * container, conformance is anchored the QOI way — hand-assembled
  * spec vectors in Vp8lSpec built bit-by-bit from the spec text, plus
  * roundtrips through [[syntheticWebpGray]], whose ENCODER makes
  * independent coding choices per variant (flat codes, color cache,
  * LZ77 with direct distances, subtract-green, palette, predictor)
  * so a shared misreading would have to hold across six different
  * bitstream shapes AND the hand vectors to stay hidden.
  *
  * Corrupt-input posture matches every sibling decoder: any structural
  * violation (over-subscribed prefix code, backward reference before
  * the first pixel, truncated stream, bad transform geometry) → None,
  * never a throw, never a fabricated pixel.
  *
  * Scale shape: pure per-row map kernel — decode happens inside the
  * scan task via [[Multimodal.imageGrayOf]]'s dispatch; bytes never
  * shuffle. Reference scope: kafi has no media surface (its closest is
  * the opaque blob walk, kafi/fs/fs_reader.py:1); LLM-pipeline
  * extension breadth, sibling to [[Flac]]/[[Tiff]].
  */
object Vp8l {

  // ------------------------------------------------------------------
  // Bit I/O (LSB-first, the VP8L convention)
  // ------------------------------------------------------------------

  private final class BitReader(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bitPos = 0
    var eof = false
    def bit(): Int =
      if (pos >= end) { eof = true; 0 }
      else {
        val v = (b(pos) >> bitPos) & 1
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; pos += 1 }
        v
      }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
  }

  private[llm] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def putBits(v: Int, n: Int): this.type = { // LSB-first
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        i += 1
      }
      this
    }
    /** A prefix CODE's bits go out MSB-of-code-first. */
    def putCode(code: Int, len: Int): this.type = {
      var i = len - 1
      while (i >= 0) { putBits((code >> i) & 1, 1); i -= 1 }
      this
    }
    def toBytes: Array[Byte] = {
      if (nBits > 0) { out.write(cur); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  // ------------------------------------------------------------------
  // Canonical prefix codes
  // ------------------------------------------------------------------

  /** Canonical code assignment (shorter first; ties by symbol order).
    * Returns (symbol → (code, len)) for nonzero lengths; None when the
    * lengths violate Kraft (over-subscribed or incomplete), EXCEPT the
    * single-symbol case, which is the legal zero-bit code. */
  private[llm] def canonical(lengths: Array[Int]): Option[Map[Int, (Int, Int)]] = {
    val nz = lengths.zipWithIndex.filter(_._1 > 0)
    if (nz.isEmpty) return None
    if (nz.length == 1) return Some(Map(nz.head._2 -> ((0, 0))))
    val maxLen = nz.map(_._1).max
    if (maxLen > 15) return None
    // Kraft must be EXACT: an incomplete code has undecodable gaps, an
    // over-subscribed one is ambiguous — both are corrupt streams
    var kraft = 0L
    nz.foreach { case (l, _) => kraft += 1L << (maxLen - l) }
    if (kraft != (1L << maxLen)) return None
    var code = 0
    var prevLen = 0
    val m = Map.newBuilder[Int, (Int, Int)]
    nz.sortBy { case (l, s) => (l, s) }.foreach { case (l, s) =>
      code <<= (l - prevLen)
      m += s -> ((code, l))
      code += 1
      prevLen = l
    }
    Some(m.result())
  }

  /** Decode-side table: per length, the first canonical code and the
    * symbols at that length in order. Zero-length (single-symbol) codes
    * read no bits. */
  private final class Prefix private (
      val single: Int, // >= 0 when the code is the zero-bit single-symbol form
      count: Array[Int], firstCode: Array[Int], offset: Array[Int],
      syms: Array[Int], maxLen: Int) {
    def decode(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len < maxLen) {
        code = (code << 1) | br.bit()
        len += 1
        if (br.eof) return -1
        if (count(len) > 0 && code >= firstCode(len) && code - firstCode(len) < count(len))
          return syms(offset(len) + code - firstCode(len))
      }
      -1
    }
  }

  private object Prefix {
    /** Two-symbol code in LISTED order: bit 0 → s0, bit 1 → s1.
      * The simple-form header carries the symbols in stream order and
      * libwebp's decoder maps them positionally, bypassing the
      * canonical (length, symbol) sort used for normal-form codes. */
    def pair(s0: Int, s1: Int): Prefix = {
      val count = Array(0, 2)
      val firstCode = Array(0, 0)
      val offset = Array(0, 0)
      new Prefix(-1, count, firstCode, offset, Array(s0, s1), 1)
    }

    def build(lengths: Array[Int]): Option[Prefix] = {
      val nz = lengths.zipWithIndex.filter(_._1 > 0)
      if (nz.isEmpty) return None
      if (nz.length == 1)
        return Some(new Prefix(nz.head._2, null, null, null, null, 0))
      val maxLen = nz.map(_._1).max
      if (maxLen > 15) return None
      val count = new Array[Int](maxLen + 1)
      nz.foreach { case (l, _) => count(l) += 1 }
      var kraft = 0L
      nz.foreach { case (l, _) => kraft += 1L << (maxLen - l) }
      if (kraft != (1L << maxLen)) return None
      val firstCode = new Array[Int](maxLen + 1)
      val offset = new Array[Int](maxLen + 1)
      var code = 0
      var off = 0
      var l = 1
      while (l <= maxLen) {
        firstCode(l) = code
        offset(l) = off
        code = (code + count(l)) << 1
        off += count(l)
        l += 1
      }
      val syms = new Array[Int](nz.length)
      val next = offset.clone()
      nz.sortBy { case (len, s) => (len, s) }.foreach { case (len, s) =>
        syms(next(len)) = s; next(len) += 1
      }
      Some(new Prefix(-1, count, firstCode, offset, syms, maxLen))
    }
  }

  /** The spec's fixed read order for the code-length code's own
    * lengths — a 19-entry permutation spelled out in the spec prose. */
  private[llm] val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read ONE prefix code (simple or normal form) for `alphabet`
    * symbols. None on any structural violation. */
  private def readPrefixCode(br: BitReader, alphabet: Int): Option[Prefix] = {
    if (br.bits(1) == 1) { // simple: 1 or 2 symbols, carried literally
      val numSyms = br.bits(1) + 1
      val firstBits = if (br.bits(1) == 1) 8 else 1
      val s0 = br.bits(firstBits)
      if (br.eof || s0 >= alphabet) return None
      if (numSyms == 1) { // single symbol → zero-bit code
        val a = new Array[Int](alphabet); a(s0) = 1
        return Prefix.build(a)
      }
      val s1 = br.bits(8)
      if (br.eof || s1 >= alphabet || s1 == s0) return None
      // Listed order is normative here: libwebp's decoder assigns code
      // 0 to the FIRST-listed symbol, not the canonically smaller one.
      // libwebp's encoder happens to list ascending, but a third-party
      // stream listing the larger symbol first must decode s0 on bit 0.
      Some(Prefix.pair(s0, s1))
    } else { // normal: code lengths themselves prefix-coded
      val numCodes = br.bits(4) + 4
      if (numCodes > ClOrder.length) return None
      val clLens = new Array[Int](ClOrder.length)
      var i = 0
      while (i < numCodes) { clLens(ClOrder(i)) = br.bits(3); i += 1 }
      if (br.eof) return None
      val clTree = Prefix.build(clLens).getOrElse(return None)
      var maxSymbol =
        if (br.bits(1) == 1) {
          val lenNBits = 2 + 2 * br.bits(3)
          2 + br.bits(lenNBits)
        } else alphabet
      val lens = new Array[Int](alphabet)
      var sym = 0
      var prev = 8 // the spec's default previous code length
      while (sym < alphabet && maxSymbol > 0) {
        maxSymbol -= 1
        val s = clTree.decode(br)
        if (s < 0 || br.eof) return None
        if (s < 16) {
          lens(sym) = s; sym += 1
          if (s != 0) prev = s
        } else {
          val (repeat, v) = s match {
            case 16 => (3 + br.bits(2), prev)
            case 17 => (3 + br.bits(3), 0)
            case _ => (11 + br.bits(7), 0)
          }
          if (sym + repeat > alphabet) return None
          var r = 0
          while (r < repeat) { lens(sym) = v; sym += 1; r += 1 }
        }
      }
      if (br.eof) return None
      Prefix.build(lens)
    }
  }

  // ------------------------------------------------------------------
  // LZ77 prefix coding + the close-neighbor distance map
  // ------------------------------------------------------------------

  /** The spec's prefix coding of lengths/distances: codes 0–3 are the
    * literal values 1–4; beyond, (code-2)>>1 extra bits on an
    * exponential offset. */
  private def lz77Value(code: Int, br: BitReader): Int =
    if (code < 4) code + 1
    else {
      val eb = (code - 2) >> 1
      val off = (2 + (code & 1)) << eb
      off + br.bits(eb) + 1
    }

  /** Inverse of [[lz77Value]] for the fixture encoder: (code,
    * extraBits, extraValue). */
  private[llm] def lz77Encode(v: Int): (Int, Int, Int) = {
    require(v >= 1)
    if (v <= 4) (v - 1, 0, 0)
    else {
      var eb = 1
      while (((2 + 1) << eb) + (1 << eb) < v) eb += 1 // max of odd code at eb
      // candidates at this eb: code 2+2*eb covers (2<<eb)+1 .. (3<<eb);
      // code 3+2*eb covers (3<<eb)+1 .. (4<<eb)
      if (v <= (3 << eb)) (2 + 2 * eb, eb, v - (2 << eb) - 1)
      else (3 + 2 * eb, eb, v - (3 << eb) - 1)
    }
  }

  /** The 120-entry close-neighbor (dx, dy) map for distance codes
    * 1–120, DERIVED from its generative rule rather than transcribed:
    * the neighborhood {y = 0, x > 0} ∪ {1 ≤ y, any x} sorted by
    * Euclidean distance ascending, ties by LARGER y first, then larger
    * x first ((1,2) before (-1,2)). The spec's printed table follows
    * exactly this order — Vp8lSpec pins the first 30 entries
    * hand-transcribed from the spec text against this derivation, and
    * the oracled fixtures use only DIRECT distances (code > 120), so a
    * divergence deep in the table could affect only foreign files, not
    * a silent oracle pass. */
  private[llm] val distMap: Array[(Int, Int)] = {
    val cand = for {
      y <- 0 to 8
      x <- -8 to 8
      if y > 0 || x > 0
    } yield (x, y)
    cand.sortBy { case (x, y) => (x * x + y * y, -y, -x) }.take(120).toArray
  }

  // ------------------------------------------------------------------
  // Entropy-coded image decode
  // ------------------------------------------------------------------

  private def divUp(a: Int, b: Int): Int = (a + b - 1) / b

  private final case class CodeGroup(green: Prefix, red: Prefix, blue: Prefix,
      alpha: Prefix, dist: Prefix)

  /** Decode one entropy-coded image of w×h pixels. `allowMeta` is true
    * only for the main ARGB image (spec: meta prefix codes are for the
    * ARGB role only). Returns packed ARGB ints. */
  private def decodeEntropyImage(br: BitReader, w: Int, h: Int,
      allowMeta: Boolean): Option[Array[Int]] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    // color cache info comes first
    val cacheBits = if (br.bits(1) == 1) br.bits(4) else 0
    if (cacheBits > 11 || br.eof) return None
    // meta prefix codes (main image only)
    var metaBits = 0
    var metaImg: Array[Int] = null
    var metaW = 0
    var groups = 1
    if (allowMeta && br.bits(1) == 1) {
      metaBits = br.bits(3) + 2
      metaW = divUp(w, 1 << metaBits)
      val metaH = divUp(h, 1 << metaBits)
      metaImg = decodeEntropyImage(br, metaW, metaH, allowMeta = false)
        .getOrElse(return None)
      var mx = 0
      var i = 0
      while (i < metaImg.length) {
        val g = (metaImg(i) >> 8) & 0xFFFF
        if (g > mx) mx = g
        i += 1
      }
      groups = mx + 1
      if (groups > 1024) return None // adversarial-input bound, documented
    }
    val greenAlphabet = 256 + 24 + (if (cacheBits > 0) 1 << cacheBits else 0)
    val code = Array.fill(groups) {
      val g = readPrefixCode(br, greenAlphabet).getOrElse(return None)
      val r = readPrefixCode(br, 256).getOrElse(return None)
      val b = readPrefixCode(br, 256).getOrElse(return None)
      val a = readPrefixCode(br, 256).getOrElse(return None)
      val d = readPrefixCode(br, 40).getOrElse(return None)
      CodeGroup(g, r, b, a, d)
    }
    val n = w * h
    val px = new Array[Int](n)
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null
    def insert(argb: Int): Unit =
      if (cache != null) cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
    var pos = 0
    while (pos < n) {
      val g =
        if (metaImg == null) code(0)
        else {
          val x = pos % w; val y = pos / w
          val idx = (metaImg((y >> metaBits) * metaW + (x >> metaBits)) >> 8) & 0xFFFF
          code(idx)
        }
      val s = g.green.decode(br)
      if (s < 0 || br.eof) return None
      if (s < 256) {
        val r = g.red.decode(br)
        val b = g.blue.decode(br)
        val a = g.alpha.decode(br)
        if (r < 0 || b < 0 || a < 0 || br.eof) return None
        val argb = (a << 24) | (r << 16) | (s << 8) | b
        px(pos) = argb; insert(argb); pos += 1
      } else if (s < 280) {
        val len = lz77Value(s - 256, br)
        val dsym = g.dist.decode(br)
        if (dsym < 0 || br.eof) return None
        val dcode = lz77Value(dsym, br)
        val dist0 =
          if (dcode > 120) dcode - 120
          else {
            val (dx, dy) = distMap(dcode - 1)
            math.max(1, dy * w + dx)
          }
        if (dist0 > pos || pos + len > n) return None
        var i = 0
        while (i < len) {
          val v = px(pos - dist0); px(pos) = v; insert(v); pos += 1; i += 1
        }
      } else {
        val idx = s - 280
        if (cache == null || idx >= cache.length) return None
        px(pos) = cache(idx); pos += 1
      }
    }
    Some(px)
  }

  // ------------------------------------------------------------------
  // Transforms (inverse application, reverse read order)
  // ------------------------------------------------------------------

  private sealed trait Transform
  private final case class TPredictor(sizeBits: Int, sub: Array[Int], subW: Int) extends Transform
  private final case class TColor(sizeBits: Int, sub: Array[Int], subW: Int) extends Transform
  private case object TSubtractGreen extends Transform
  private final case class TColorIndex(palette: Array[Int], packBits: Int) extends Transform

  @inline private def avg2(a: Int, b: Int): Int = {
    // per-channel floor average, SIMD-free closed form
    (((a ^ b) & 0xFEFEFEFE) >>> 1) + (a & b)
  }
  @inline private def addPixels(a: Int, b: Int): Int = {
    val rb = ((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF
    val ag = ((a & 0xFF00FF00) >>> 8) + ((b & 0xFF00FF00) >>> 8)
    ((ag & 0x00FF00FF) << 8) | rb
  }
  @inline private def chan(p: Int, sh: Int): Int = (p >>> sh) & 0xFF

  private def select(l: Int, t: Int, tl: Int): Int = {
    var pL = 0; var pT = 0
    var sh = 0
    while (sh < 32) {
      val p = chan(l, sh) + chan(t, sh) - chan(tl, sh)
      pL += math.abs(p - chan(l, sh))
      pT += math.abs(p - chan(t, sh))
      sh += 8
    }
    // Tie goes to TOP: libwebp (and RFC 9649's reference decoder)
    // return left only on pL < pT STRICTLY. The predictor transform is
    // pixel-recursive, so getting the tie wrong corrupts everything
    // downstream of the first tied pixel in real encoder output.
    if (pL < pT) l else t
  }
  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    var out = 0; var sh = 0
    while (sh < 32) {
      val v = chan(l, sh) + chan(t, sh) - chan(tl, sh)
      out |= math.max(0, math.min(255, v)) << sh
      sh += 8
    }
    out
  }
  private def clampAddSubtractHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    var out = 0; var sh = 0
    while (sh < 32) {
      val a = chan(ave, sh)
      val v = a + (a - chan(tl, sh)) / 2 // C truncation toward zero
      out |= math.max(0, math.min(255, v)) << sh
      sh += 8
    }
    out
  }

  private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int = mode match {
    case 0 => 0xFF000000
    case 1 => l
    case 2 => t
    case 3 => tr
    case 4 => tl
    case 5 => avg2(avg2(l, tr), t)
    case 6 => avg2(l, tl)
    case 7 => avg2(l, t)
    case 8 => avg2(tl, t)
    case 9 => avg2(t, tr)
    case 10 => avg2(avg2(l, tl), avg2(t, tr))
    case 11 => select(l, t, tl)
    case 12 => clampAddSubtractFull(l, t, tl)
    case 13 => clampAddSubtractHalf(l, t, tl)
    case _ => 0xFF000000 // modes 14/15 are reserved; degrade deterministically
  }

  private def inversePredictor(px: Array[Int], w: Int, h: Int, tf: TPredictor): Unit = {
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p =
          if (x == 0 && y == 0) 0xFF000000
          else if (y == 0) px(pos - 1) // top row: forced L
          else if (x == 0) px(pos - w) // left column: forced T
          else {
            val mode = (tf.sub((y >> tf.sizeBits) * tf.subW + (x >> tf.sizeBits)) >> 8) & 0xFF
            // TR at the right border reads linear memory: pos-w+1 is the
            // CURRENT row's first pixel (already reconstructed) — the
            // spec's defined wrap, not an accident
            predict(mode, px(pos - 1), px(pos - w), px(pos - w - 1), px(pos - w + 1))
          }
        px(pos) = addPixels(px(pos), p)
        x += 1; pos += 1
      }
      y += 1
    }
  }

  @inline private def ctDelta(t: Int, c: Int): Int = ((t.toByte.toInt * c.toByte.toInt) >> 5)

  private def inverseColor(px: Array[Int], w: Int, h: Int, tf: TColor): Unit = {
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = tf.sub((y >> tf.sizeBits) * tf.subW + (x >> tf.sizeBits))
        val g2r = cte & 0xFF // blue channel carries green_to_red
        val g2b = (cte >> 8) & 0xFF // green channel carries green_to_blue
        val r2b = (cte >> 16) & 0xFF // red channel carries red_to_blue
        val p = px(pos)
        val g = (p >> 8) & 0xFF
        var r = (p >> 16) & 0xFF
        var b = p & 0xFF
        r = (r + ctDelta(g2r, g)) & 0xFF
        b = (b + ctDelta(g2b, g)) & 0xFF
        b = (b + ctDelta(r2b, r)) & 0xFF // uses the RECONSTRUCTED red
        px(pos) = (p & 0xFF00FF00) | (r << 16) | b
        x += 1; pos += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >> 8) & 0xFF
      val r = (((p >> 16) & 0xFF) + g) & 0xFF
      val b = ((p & 0xFF) + g) & 0xFF
      px(i) = (p & 0xFF00FF00) | (r << 16) | b
      i += 1
    }
  }

  private def inverseColorIndex(px: Array[Int], packedW: Int, w: Int, h: Int,
      tf: TColorIndex): Option[Array[Int]] = {
    val out = new Array[Int](w * h)
    val ppb = 1 << tf.packBits
    val ibits = 8 >> tf.packBits // index width within the packed green byte
    val mask = (1 << ibits) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val src = px(y * packedW + x / ppb)
        val g = (src >> 8) & 0xFF
        val idx = (g >> ((x % ppb) * ibits)) & mask
        // out-of-range palette index: the documented degrade is
        // transparent black (never a throw, never a neighboring entry)
        out(y * w + x) = if (idx < tf.palette.length) tf.palette(idx) else 0
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  // ------------------------------------------------------------------
  // Top-level decode
  // ------------------------------------------------------------------

  /** Decode a raw VP8L payload (starting at the 0x2F signature byte) →
    * (width, height, ARGB pixels). */
  private[llm] def decodeArgb(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (p == null || p.length < 5 || (p(0) & 0xFF) != 0x2F) return None
    val br = new BitReader(p, 1, p.length)
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    br.bits(1) // alpha-is-used hint — informational
    if (br.bits(3) != 0) return None // version must be 0
    if (w.toLong * h > (1L << 24)) return None // 16 Mpx admission bound
    try {
      // transforms, each type at most once, in stream order
      var effW = w
      var transforms = List.empty[Transform] // head = last read
      var seen = 0
      while (!br.eof && br.bits(1) == 1) {
        val t = br.bits(2)
        if ((seen & (1 << t)) != 0) return None
        seen |= 1 << t
        t match {
          case 0 | 1 =>
            val sb = br.bits(3) + 2
            val subW = divUp(effW, 1 << sb)
            val subH = divUp(h, 1 << sb)
            val sub = decodeEntropyImage(br, subW, subH, allowMeta = false)
              .getOrElse(return None)
            transforms ::= (if (t == 0) TPredictor(sb, sub, subW) else TColor(sb, sub, subW))
          case 2 =>
            transforms ::= TSubtractGreen
          case _ =>
            val nCol = br.bits(8) + 1
            val deltas = decodeEntropyImage(br, nCol, 1, allowMeta = false)
              .getOrElse(return None)
            // palette entries are delta-coded per channel
            val pal = new Array[Int](nCol)
            var prev = 0
            var i = 0
            while (i < nCol) { prev = addPixels(prev, deltas(i)); pal(i) = prev; i += 1 }
            val packBits = if (nCol <= 2) 3 else if (nCol <= 4) 2 else if (nCol <= 16) 1 else 0
            transforms ::= TColorIndex(pal, packBits)
            effW = divUp(effW, 1 << packBits)
        }
      }
      if (br.eof) return None
      var px = decodeEntropyImage(br, effW, h, allowMeta = true).getOrElse(return None)
      var curW = effW
      // inverse transforms in reverse read order (head of list first)
      transforms.foreach {
        case tf: TColorIndex =>
          // unbundling restores the full header width; packBits 0 keeps
          // the geometry and only resolves indices through the palette
          val outW = if (tf.packBits == 0) curW else w
          px = inverseColorIndex(px, curW, outW, h, tf).getOrElse(return None)
          curW = outW
        case tf: TPredictor => inversePredictor(px, curW, h, tf)
        case tf: TColor => inverseColor(px, curW, h, tf)
        case TSubtractGreen => inverseSubtractGreen(px)
      }
      if (curW != w) return None // geometry must close back to the header dims
      Some((w, h, px))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** RIFF/WEBP bytes → (w, h, BT.601 luma), matching the family's
    * integer luma so VP8L re-exports near-dup match other containers.
    * Only the lossless flavor decodes; lossy VP8 stays None (honest
    * failure, [[Containers.parseWebp]] still reads its metadata). */
  private[graft] def decodeGray(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    payloadOf(b).flatMap(decodeArgb).map { case (w, h, px) =>
      val gray = new Array[Int](px.length)
      var i = 0
      while (i < px.length) {
        val p = px(i)
        gray(i) = (299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) + 114 * (p & 0xFF)) / 1000
        i += 1
      }
      (w, h, gray)
    }
  }

  /** Is this a RIFF/WEBP file whose image payload is VP8L? */
  private[graft] def isWebpLossless(b: Array[Byte]): Boolean = payloadOf(b).isDefined

  /** Extract the VP8L chunk payload from RIFF framing (walks chunks the
    * same even-byte-aligned way as [[Containers.parseWebp]]). */
  private[llm] def payloadOf(b: Array[Byte]): Option[Array[Byte]] = {
    if (b == null || b.length < 20) return None
    def tag(o: Int) = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(o: Int) =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) |
        ((b(o + 3).toLong & 0xFF) << 24)
    if (tag(0) != "RIFF" || tag(8) != "WEBP") return None
    var p = 12
    while (p + 8 <= b.length) {
      val t = tag(p)
      val sz = u32(p + 4)
      if (sz < 0 || sz > b.length) return None
      val body = p + 8
      if (t == "VP8L") {
        if (body + sz > b.length) return None
        return Some(java.util.Arrays.copyOfRange(b, body, (body + sz).toInt))
      }
      p = body + sz.toInt + (sz.toInt & 1) // chunks are even-aligned
    }
    None
  }

  // ------------------------------------------------------------------
  // Fixture encoder (tests + oracle queries build REAL files, the
  // decoder above must read the pixels back — the syntheticQoi pattern)
  // ------------------------------------------------------------------

  /** Wrap a VP8L payload in RIFF/WEBP framing. */
  private[llm] def riffWrap(payload: Array[Byte]): Array[Byte] = {
    val padded = payload.length + (payload.length & 1)
    val out = java.nio.ByteBuffer.allocate(12 + 8 + padded)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(4 + 8 + padded).put("WEBP".getBytes)
    out.put("VP8L".getBytes).putInt(payload.length).put(payload)
    out.array()
  }

  /** Emit one prefix code in NORMAL form given per-symbol lengths,
    * using a balanced code-length code over the tokens actually used.
    * Returns the canonical (code,len) map for emitting symbols. */
  private[llm] def writeNormalCode(bw: BitWriter, lengths: Array[Int]): Map[Int, (Int, Int)] = {
    // tokenize: runs of equal lengths → literal token + 16-repeats
    val tokens = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (clSymbol, extra)
    var i = 0
    while (i < lengths.length) {
      var j = i
      while (j < lengths.length && lengths(j) == lengths(i)) j += 1
      var run = j - i
      val l = lengths(i)
      if (l == 0) {
        // zero runs: 17 (3-10) / 18 (11-138), literal 0 for tails
        while (run >= 11) { val r = math.min(138, run); tokens += ((18, r - 11)); run -= r }
        if (run >= 3) { tokens += ((17, run - 3)); run = 0 }
        while (run > 0) { tokens += ((0, 0)); run -= 1 }
      } else {
        tokens += ((l, 0)); run -= 1
        while (run >= 3) { val r = math.min(6, run); tokens += ((16, r - 3)); run -= r }
        while (run > 0) { tokens += ((l, 0)); run -= 1 }
      }
      i = j
    }
    // trailing zero-run can be dropped entirely (decoder zero-fills),
    // but only when something nonzero was already emitted — keep all
    // tokens for simplicity (alphabet is read to the end)
    val used = tokens.map(_._1).distinct.sorted
    // balanced complete code over the used tokens
    val k = used.length
    val clLens = new Array[Int](19)
    if (k == 1) clLens(used.head) = 1 // single-symbol zero-bit tree
    else {
      val lmax = 32 - Integer.numberOfLeadingZeros(k - 1) // ceil(log2 k)
      val nDeep = 2 * k - (1 << lmax)
      used.zipWithIndex.foreach { case (s, ix) =>
        clLens(s) = if (ix < k - nDeep) lmax - 1 else lmax
      }
      // ix < k-nDeep get the shallow length; Kraft: (k-nDeep)/2^(l-1) + nDeep/2^l = 1
    }
    val clCanon = canonical(clLens).get
    bw.putBits(0, 1) // normal form
    val numCodes = ClOrder.length - ClOrder.reverse.takeWhile(clLens(_) == 0).length
    val nc = math.max(4, numCodes)
    bw.putBits(nc - 4, 4)
    var o = 0
    while (o < nc) { bw.putBits(clLens(ClOrder(o)), 3); o += 1 }
    bw.putBits(0, 1) // no max_symbol shortcut
    tokens.foreach { case (s, extra) =>
      val (c, l) = clCanon(s)
      if (l > 0) bw.putCode(c, l)
      s match {
        case 16 => bw.putBits(extra, 2)
        case 17 => bw.putBits(extra, 3)
        case 18 => bw.putBits(extra, 7)
        case _ =>
      }
    }
    canonical(lengths).get
  }

  /** Emit a simple one-symbol code (zero decode bits). */
  private[llm] def writeSingleCode(bw: BitWriter, symbol: Int): Unit = {
    bw.putBits(1, 1) // simple
    bw.putBits(0, 1) // one symbol
    bw.putBits(1, 1) // 8-bit symbol field
    bw.putBits(symbol, 8)
  }

  /** Flat complete lengths for the 256-symbol channels. */
  private def flat256: Array[Int] = Array.fill(256)(8)

  /** Build a REAL VP8L file carrying `gray` as an (r=g=b) image.
    * Variants make the ENCODER take different bitstream paths while
    * the pixels stay identical — the oracle replays pixels only:
    *  0: literals, flat codes;
    *  1: color cache (4-bit) with cache-hit emission;
    *  2: LZ77 length-1 copies at direct distances (code > 120);
    *  3: subtract-green transform;
    *  4: color-indexing (palette) transform, unbundled;
    *  5: predictor transform, uniform mode 2 (top), size_bits 2. */
  def syntheticWebpGray(width: Int, height: Int, gray: Array[Int], variant: Int): Array[Byte] =
    riffWrap(vp8lPayloadGray(width, height, gray, variant))

  /** The raw VP8L payload for an (r=g=b) image at uniform `alpha` —
    * shared by the still fixture ([[syntheticWebpGray]]) and the
    * animation fixture's per-frame payloads. */
  private[llm] def vp8lPayloadGray(width: Int, height: Int, gray: Array[Int],
      variant: Int, alpha: Int = 255): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height)
    val bw = new BitWriter
    bw.putBits(0x2F, 8)
    bw.putBits(width - 1, 14)
    bw.putBits(height - 1, 14)
    bw.putBits(if (alpha != 255) 1 else 0, 1) // alpha hint
    bw.putBits(0, 3) // version 0
    val argb = gray.map(g => (alpha << 24) | (g << 16) | (g << 8) | g)
    variant % 6 match {
      case 0 => bw.putBits(0, 1); encodeLiterals(bw, argb) // no transforms
      case 1 => bw.putBits(0, 1); encodeWithCache(bw, argb)
      case 2 => bw.putBits(0, 1); encodeLz77(bw, argb, width)
      case 3 =>
        bw.putBits(1, 1); bw.putBits(2, 2) // transform: subtract-green
        bw.putBits(0, 1) // end of transforms
        encodeLiterals(bw, argb.map { p =>
          val g = (p >> 8) & 0xFF
          val r = (((p >> 16) & 0xFF) - g) & 0xFF
          val b = ((p & 0xFF) - g) & 0xFF
          (p & 0xFF00FF00) | (r << 16) | b
        })
      case 4 => encodePalette(bw, argb)
      case _ => encodePredictorTop(bw, argb, width, height)
    }
    bw.toBytes
  }

  /** Literal-only body: flat 9-bit literals + a 1-bit filler length
    * code completing Kraft; channels flat 8-bit; single-symbol distance
    * code (never used, zero bits). `isMain = false` for sub-images
    * (transform data, palettes), which carry NO meta-prefix bit. */
  private def encodeLiterals(bw: BitWriter, argb: Array[Int], isMain: Boolean = true): Unit = {
    bw.putBits(0, 1) // no color cache
    if (isMain) bw.putBits(0, 1) // no meta prefix (main image only)
    val greenLens = new Array[Int](280)
    java.util.Arrays.fill(greenLens, 0, 256, 9)
    greenLens(256) = 1
    val gc = writeNormalCode(bw, greenLens)
    val rc = writeNormalCode(bw, flat256)
    val bc = writeNormalCode(bw, flat256)
    val ac = writeNormalCode(bw, flat256)
    writeSingleCode(bw, 0) // distance
    argb.foreach { p =>
      val (cg, lg) = gc((p >> 8) & 0xFF); bw.putCode(cg, lg)
      val (cr, lr) = rc((p >> 16) & 0xFF); bw.putCode(cr, lr)
      val (cb, lb) = bc(p & 0xFF); bw.putCode(cb, lb)
      val (ca, la) = ac((p >>> 24) & 0xFF); bw.putCode(ca, la)
    }
  }

  /** Color-cache body: 4-bit cache; the encoder emits a cache symbol
    * whenever the current ARGB is resident under the spec hash. */
  private def encodeWithCache(bw: BitWriter, argb: Array[Int]): Unit = {
    bw.putBits(1, 1); bw.putBits(4, 4) // cache_bits = 4
    bw.putBits(0, 1) // no meta prefix
    val greenLens = new Array[Int](256 + 24 + 16)
    java.util.Arrays.fill(greenLens, 0, 256, 9)
    var s = 280
    while (s < 296) { greenLens(s) = 5; s += 1 } // 16 × 2^-5 completes Kraft
    val gc = writeNormalCode(bw, greenLens)
    val rc = writeNormalCode(bw, flat256)
    val bc = writeNormalCode(bw, flat256)
    val ac = writeNormalCode(bw, flat256)
    writeSingleCode(bw, 0)
    val cache = new Array[Int](16)
    val live = new Array[Boolean](16)
    argb.foreach { p =>
      val h = (0x1e35a7bd * p) >>> 28
      if (live(h) && cache(h) == p) {
        val (c, l) = gc(280 + h); bw.putCode(c, l)
      } else {
        val (cg, lg) = gc((p >> 8) & 0xFF); bw.putCode(cg, lg)
        val (cr, lr) = rc((p >> 16) & 0xFF); bw.putCode(cr, lr)
        val (cb, lb) = bc(p & 0xFF); bw.putCode(cb, lb)
        val (ca, la) = ac((p >>> 24) & 0xFF); bw.putCode(ca, la)
        cache(h) = p; live(h) = true
      }
    }
  }

  /** LZ77 body: length-1 copies whenever an equal pixel sits at a
    * DIRECT distance (code > 120) in a fixed window, so the length
    * path, the distance path, and its extra bits are all load-bearing
    * while the neighbor map stays out of the oracle (see [[distMap]]).
    * Window [137, 264]: distance codes 257..384, all under length
    * prefix 16 with 7 extra bits — the distance tree is the
    * single-symbol code {16}. */
  private def encodeLz77(bw: BitWriter, argb: Array[Int], w: Int): Unit = {
    bw.putBits(0, 1) // no cache
    bw.putBits(0, 1) // no meta
    val greenLens = new Array[Int](280)
    java.util.Arrays.fill(greenLens, 0, 256, 9)
    greenLens(256) = 1 // LZ77 length code for len 1
    val gc = writeNormalCode(bw, greenLens)
    val rc = writeNormalCode(bw, flat256)
    val bc = writeNormalCode(bw, flat256)
    val ac = writeNormalCode(bw, flat256)
    writeSingleCode(bw, 16) // distance prefix 16: values 257..384, eb=7
    var pos = 0
    while (pos < argb.length) {
      val p = argb(pos)
      var d = 137
      var found = -1
      while (found < 0 && d <= 264 && d <= pos) {
        if (argb(pos - d) == p) found = d
        d += 1
      }
      if (found > 0) {
        val (c256, l256) = gc(256); bw.putCode(c256, l256) // length 1
        // distance tree is zero-bit; dcode = found + 120 ∈ [257, 384]
        bw.putBits(found + 120 - 257, 7)
      } else {
        val (cg, lg) = gc((p >> 8) & 0xFF); bw.putCode(cg, lg)
        val (cr, lr) = rc((p >> 16) & 0xFF); bw.putCode(cr, lr)
        val (cb, lb) = bc(p & 0xFF); bw.putCode(cb, lb)
        val (ca, la) = ac((p >>> 24) & 0xFF); bw.putCode(ca, la)
      }
      pos += 1
    }
  }

  /** Color-indexing body: palette of the distinct ARGB values (≤ 256,
    * unbundled fixture keeps > 16 colors), delta-coded entries, pixel
    * indices in the green channel. */
  private def encodePalette(bw: BitWriter, argb: Array[Int]): Unit = {
    val palette = argb.distinct.sorted
    require(palette.length > 16 && palette.length <= 256,
      "unbundled palette fixture needs 17..256 colors")
    bw.putBits(1, 1); bw.putBits(3, 2) // transform: color indexing
    bw.putBits(palette.length - 1, 8)
    // palette as an entropy-coded image of per-channel deltas
    val deltas = palette.zipWithIndex.map { case (p, i) =>
      if (i == 0) p
      else {
        val q = palette(i - 1)
        val a = (((p >>> 24) & 0xFF) - ((q >>> 24) & 0xFF)) & 0xFF
        val r = (((p >> 16) & 0xFF) - ((q >> 16) & 0xFF)) & 0xFF
        val g = (((p >> 8) & 0xFF) - ((q >> 8) & 0xFF)) & 0xFF
        val b = ((p & 0xFF) - (q & 0xFF)) & 0xFF
        (a << 24) | (r << 16) | (g << 8) | b
      }
    }
    encodeLiterals(bw, deltas, isMain = false) // palette is a sub-image: no meta bit
    bw.putBits(0, 1) // end of transforms
    val index = palette.zipWithIndex.toMap
    encodeLiterals(bw, argb.map(p => (index(p) << 8) | 0xFF000000))
  }

  /** Predictor body: uniform mode 2 (top) blocks at size_bits 2; the
    * residual image is pixel − top (mod 256 per channel) with the
    * spec's forced borders (black seed, L on row 0, T on column 0). */
  private def encodePredictorTop(bw: BitWriter, argb: Array[Int], w: Int, h: Int): Unit = {
    bw.putBits(1, 1); bw.putBits(0, 2) // transform: predictor
    bw.putBits(0, 3) // size_bits = 2
    val subW = divUp(w, 4)
    val subH = divUp(h, 4)
    // mode lives in the green channel of the sub-image pixel
    encodeLiterals(bw, Array.fill(subW * subH)(0xFF000000 | (2 << 8)), isMain = false)
    bw.putBits(0, 1) // end of transforms
    def sub(p: Int, q: Int): Int = {
      val a = (((p >>> 24) & 0xFF) - ((q >>> 24) & 0xFF)) & 0xFF
      val r = (((p >> 16) & 0xFF) - ((q >> 16) & 0xFF)) & 0xFF
      val g = (((p >> 8) & 0xFF) - ((q >> 8) & 0xFF)) & 0xFF
      val b = ((p & 0xFF) - (q & 0xFF)) & 0xFF
      (a << 24) | (r << 16) | (g << 8) | b
    }
    val res = new Array[Int](argb.length)
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xFF000000
          else if (y == 0) argb(pos - 1)
          else argb(pos - w) // mode 2 everywhere + forced T on column 0
        res(pos) = sub(argb(pos), pred)
        x += 1; pos += 1
      }
      y += 1
    }
    encodeLiterals(bw, res)
  }

  // ------------------------------------------------------------------
  // Animated WebP (VP8X + ANIM/ANMF with VP8L frame payloads) — round
  // 14: the modern web's animated format joins the video near-dup
  // family (Y4M and animated GIF were already covered). The walk reads
  // the ANMF compositing model: per-frame (x, y) placement in 2-px
  // units, alpha-blend vs overwrite (flags bit 1), and
  // dispose-to-background (flags bit 0). Compositing is defined here
  // in exact integers: src-over uses floor((src*a + dst*(255-a))/255)
  // per channel against an opaque canvas seeded with the ANIM
  // background color — the fixture and oracle replay the same
  // arithmetic. A lossy (VP8) frame makes content hashing impossible →
  // None for the whole file, the same honest posture as lossy stills.
  // ------------------------------------------------------------------

  /** Find one subchunk's payload inside [off, end). */
  private def subchunk(b: Array[Byte], off: Int, end: Int, want: String): Option[Array[Byte]] = {
    var p = off
    while (p + 8 <= end) {
      val t = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = (b(p + 4) & 0xFF) | ((b(p + 5) & 0xFF) << 8) |
        ((b(p + 6) & 0xFF) << 16) | ((b(p + 7) & 0xFF) << 24)
      if (sz < 0 || p + 8 + sz > end) return None
      if (t == want) return Some(java.util.Arrays.copyOfRange(b, p + 8, p + 8 + sz))
      p = p + 8 + sz + (sz & 1)
    }
    None
  }

  /** Animated WebP → sampled composited luma frames, the
    * [[Multimodal.videoFramesSampled]] contract (k = min(sampleFrames,
    * n); sampled indices i·n/k; rows carry the true frame index).
    * None when not an animated WebP, when any frame is lossy or
    * corrupt, or when geometry violates the canvas. */
  private[graft] def decodeAnimFramesSampled(b: Array[Byte], sampleFrames: Int)
      : Option[(Int, Int, Seq[(Int, Array[Int])])] = {
    if (b == null || b.length < 30 || sampleFrames <= 0) return None
    def tag(o: Int) = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u24(o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16)
    def u32(o: Int): Long = (u24(o).toLong) | ((b(o + 3).toLong & 0xFF) << 24)
    if (tag(0) != "RIFF" || tag(8) != "WEBP") return None
    var cw = -1
    var ch = -1
    var bg = 0xFF000000
    final case class Fr(x: Int, y: Int, w: Int, h: Int, blend: Boolean,
        disposeBg: Boolean, off: Int, end: Int)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Fr]
    var p = 12
    while (p + 8 <= b.length) {
      val t = tag(p)
      val sz = u32(p + 4)
      val body = p + 8
      if (sz < 0 || body + sz > b.length) return None
      t match {
        case "VP8X" if sz >= 10 =>
          cw = u24(body + 4) + 1
          ch = u24(body + 7) + 1
        case "ANIM" if sz >= 6 =>
          // Background Color: 32 bits, byte order B G R A
          bg = ((b(body + 3) & 0xFF) << 24) | ((b(body + 2) & 0xFF) << 16) |
            ((b(body + 1) & 0xFF) << 8) | (b(body) & 0xFF)
        case "ANMF" if sz >= 16 =>
          val flags = b(body + 15) & 0xFF
          frames += Fr(u24(body) * 2, u24(body + 3) * 2,
            u24(body + 6) + 1, u24(body + 9) + 1,
            blend = (flags & 2) == 0, disposeBg = (flags & 1) == 1,
            body + 16, (body + sz).toInt)
        case _ =>
      }
      p = body + sz.toInt + (sz.toInt & 1)
    }
    if (cw <= 0 || ch <= 0 || frames.isEmpty || cw.toLong * ch > (1L << 24)) return None
    val n = frames.length
    val k = math.min(sampleFrames, n)
    val sampled = (0 until k).map(i => i * n / k).toSet
    val canvas = Array.fill(cw * ch)(bg)
    val out = Seq.newBuilder[(Int, Array[Int])]
    var fi = 0
    while (fi < n) {
      val f = frames(fi)
      if (f.x + f.w > cw || f.y + f.h > ch) return None
      val pay = subchunk(b, f.off, f.end, "VP8L").getOrElse(return None)
      val (dw, dh, px) = decodeArgb(pay).getOrElse(return None)
      if (dw != f.w || dh != f.h) return None
      var yy = 0
      while (yy < f.h) {
        var xx = 0
        while (xx < f.w) {
          val src = px(yy * f.w + xx)
          val di = (f.y + yy) * cw + (f.x + xx)
          canvas(di) =
            if (!f.blend) src
            else {
              val a = src >>> 24
              val dst = canvas(di)
              var outPx = 0xFF000000
              var sh = 0
              while (sh < 24) {
                val c = (((src >>> sh) & 0xFF) * a + ((dst >>> sh) & 0xFF) * (255 - a)) / 255
                outPx |= c << sh
                sh += 8
              }
              outPx
            }
          xx += 1
        }
        yy += 1
      }
      if (sampled(fi)) {
        val luma = new Array[Int](cw * ch)
        var i = 0
        while (i < luma.length) {
          val q = canvas(i)
          luma(i) = (299 * ((q >> 16) & 0xFF) + 587 * ((q >> 8) & 0xFF) + 114 * (q & 0xFF)) / 1000
          i += 1
        }
        out += ((fi, luma))
      }
      if (f.disposeBg) {
        var yy2 = 0
        while (yy2 < f.h) {
          java.util.Arrays.fill(canvas, (f.y + yy2) * cw + f.x,
            (f.y + yy2) * cw + f.x + f.w, bg)
          yy2 += 1
        }
      }
      fi += 1
    }
    Some((cw, ch, out.result()))
  }

  /** Is this an animated WebP (VP8X animation flag + at least one
    * ANMF)? Cheap structural check for the video dispatch. */
  private[graft] def isWebpAnim(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 30) return false
    def tag(o: Int) = new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    tag(0) == "RIFF" && tag(8) == "WEBP" && tag(12) == "VP8X" &&
      b.length > 20 && (b(20) & 0x02) != 0
  }

  /** Fixture: a REAL animated WebP. Each frame: (x, y, w, h, gray,
    * alpha, blend, disposeBg, variant) — x/y must be even (ANMF's
    * 2-px-unit offsets). `bgGray` seeds the ANIM background color. */
  def syntheticWebpAnim(cw: Int, ch: Int, bgGray: Int,
      frames: Seq[(Int, Int, Int, Int, Array[Int], Int, Boolean, Boolean, Int)]): Array[Byte] = {
    require(cw >= 1 && ch >= 1 && frames.nonEmpty)
    val out = new java.io.ByteArrayOutputStream()
    def chunk(t: String, payload: Array[Byte]): Unit = {
      out.write(t.getBytes("ISO-8859-1"), 0, 4)
      var v = payload.length
      var i = 0
      while (i < 4) { out.write(v & 0xFF); v >>= 8; i += 1 }
      out.write(payload, 0, payload.length)
      if ((payload.length & 1) == 1) out.write(0)
    }
    def u24b(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xFF); o.write((v >> 8) & 0xFF); o.write((v >> 16) & 0xFF)
    }
    val vp8x = new java.io.ByteArrayOutputStream()
    vp8x.write(0x02); vp8x.write(0); vp8x.write(0); vp8x.write(0)
    u24b(vp8x, cw - 1); u24b(vp8x, ch - 1)
    val anim = new java.io.ByteArrayOutputStream()
    anim.write(bgGray); anim.write(bgGray); anim.write(bgGray); anim.write(0xFF) // B G R A
    anim.write(0); anim.write(0) // loop count
    val inner = new java.io.ByteArrayOutputStream()
    val innerChunk = (t: String, payload: Array[Byte]) => {
      inner.write(t.getBytes("ISO-8859-1"), 0, 4)
      var v = payload.length
      var i = 0
      while (i < 4) { inner.write(v & 0xFF); v >>= 8; i += 1 }
      inner.write(payload, 0, payload.length)
      if ((payload.length & 1) == 1) inner.write(0)
    }
    frames.foreach { case (x, y, w, h, gray, alpha, blend, disposeBg, variant) =>
      require(x % 2 == 0 && y % 2 == 0, "ANMF offsets are in 2-px units")
      val anmf = new java.io.ByteArrayOutputStream()
      u24b(anmf, x / 2); u24b(anmf, y / 2)
      u24b(anmf, w - 1); u24b(anmf, h - 1)
      u24b(anmf, 40) // duration ms
      anmf.write((if (blend) 0 else 2) | (if (disposeBg) 1 else 0))
      val pay = vp8lPayloadGray(w, h, gray, variant, alpha)
      anmf.write("VP8L".getBytes("ISO-8859-1"), 0, 4)
      var v = pay.length
      var i = 0
      while (i < 4) { anmf.write(v & 0xFF); v >>= 8; i += 1 }
      anmf.write(pay, 0, pay.length)
      if ((pay.length & 1) == 1) anmf.write(0)
      innerChunk("ANMF", anmf.toByteArray)
    }
    chunk("VP8X", vp8x.toByteArray)
    chunk("ANIM", anim.toByteArray)
    out.write(inner.toByteArray, 0, inner.size)
    val body = out.toByteArray
    val full = new java.io.ByteArrayOutputStream()
    full.write("RIFF".getBytes("ISO-8859-1"), 0, 4)
    var v = body.length + 4
    var i = 0
    while (i < 4) { full.write(v & 0xFF); v >>= 8; i += 1 }
    full.write("WEBP".getBytes("ISO-8859-1"), 0, 4)
    full.write(body, 0, body.length)
    full.toByteArray
  }
}
