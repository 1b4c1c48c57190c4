package graft.llm

/** FLAC decode — the lossless audio sibling of [[Tiff]]: pure-JVM
  * bit-level decode of the free-lossless-audio-codec stream format
  * (public spec, xiph.org / RFC 9639). Scope: STREAMINFO + metadata
  * walk, frame sync with CRC-8-verified headers and CRC-16-verified
  * frames, subframe types CONSTANT / VERBATIM / FIXED(0–4) / LPC,
  * Rice-coded residuals (both 4- and 5-bit parameter methods,
  * partitioned, escape-to-raw), wasted-bits shifts, and all four channel
  * layouts (independent, left/side, right/side, mid/side). Sample
  * widths 8/16/24 normalize to the int16 range exactly as
  * [[Multimodal.decodeWavPcm]] does, so a WAV and a FLAC of the same
  * recording hash identically — the cross-encoding near-dup case.
  * Corrupt input stops at the last whole frame (the Y4M posture);
  * streams with no decodable frame return None.
  *
  * Reference semantics: the reference ships no audio codec — media are
  * opaque bytes (kafi's bytes serde); content-level decode serves the
  * near-dup/fingerprint operators. The encoder below exists for
  * fixtures and tests, and exercises every decode path.
  */
object Flac {

  /** Big-endian MSB-first bit reader over the whole stream. */
  private final class BitReader(b: Array[Byte]) {
    var pos = 0L // absolute bit position
    val end: Long = b.length.toLong * 8
    def bytePos: Int = (pos >> 3).toInt
    def aligned: Boolean = (pos & 7) == 0
    def remaining: Long = end - pos
    /** n ≤ 32 bits, unsigned, MSB-first; −1 on exhaustion (callers treat
      * any negative as a truncation signal, valid reads of n ≤ 31 bits
      * are non-negative; n == 32 goes through u64). Byte-chunked, not
      * bit-looped — this reader sits under every sample of a corpus
      * decode. */
    def u(n: Int): Int = {
      if (pos + n > end) { pos = end + 1; return -1 } // poison: later checks see the overrun
      var v = 0
      var need = n
      while (need > 0) {
        val bitOff = (pos & 7).toInt
        val take = math.min(8 - bitOff, need)
        val byte = b((pos >> 3).toInt) & 0xFF
        v = (v << take) | ((byte >> (8 - bitOff - take)) & ((1 << take) - 1))
        pos += take; need -= take
      }
      v
    }
    def u64(n: Int): Long = {
      if (pos + n > end) { pos = end + 1; return -1L }
      var v = 0L
      var need = n
      while (need > 0) {
        val bitOff = (pos & 7).toInt
        val take = math.min(8 - bitOff, need)
        val byte = b((pos >> 3).toInt) & 0xFF
        v = (v << take) | ((byte >> (8 - bitOff - take)) & ((1 << take) - 1)).toLong
        pos += take; need -= take
      }
      v
    }
    /** n-bit two's-complement signed read; Int.MinValue on exhaustion. */
    def s(n: Int): Int = {
      val v = u64(n)
      if (v < 0) return Int.MinValue
      if (n == 0) 0
      else if ((v & (1L << (n - 1))) != 0) (v - (1L << n)).toInt
      else v.toInt
    }
    /** Unary: zeros then a one; −1 on exhaustion (bounds every rice
      * quotient against the buffer, so a crafted all-zeros run cannot
      * spin). Scans the tail of the current byte, then whole zero bytes,
      * instead of single bits. */
    def unary(): Int = {
      var q = 0
      while (pos < end) {
        val bitOff = (pos & 7).toInt
        val byte = b((pos >> 3).toInt) & 0xFF
        val rest = (byte << bitOff) & 0xFF // remaining bits, left-aligned
        if (rest == 0) { q += 8 - bitOff; pos += 8 - bitOff }
        else {
          val lead = java.lang.Integer.numberOfLeadingZeros(rest) - 24
          q += lead; pos += lead + 1
          return q
        }
      }
      pos = end + 1
      -1
    }
    def align(): Unit = pos = (pos + 7) & ~7L
  }

  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF; k += 1 }
      i += 1
    }
    crc
  }

  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) { crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF else (crc << 1) & 0xFFFF; k += 1 }
      i += 1
    }
    crc
  }

  private[graft] def isFlac(b: Array[Byte]): Boolean =
    b != null && b.length >= 42 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  /** The frame-header UTF-8-style coded number (frame or sample index):
    * 1–7 bytes, 36-bit capacity. Returns −1 on malformed coding. */
  private def codedNumber(br: BitReader): Long = {
    val b0 = br.u(8)
    if (b0 < 0) return -1
    if ((b0 & 0x80) == 0) return b0
    var nBytes = 0
    var mask = 0x40
    while ((b0 & mask) != 0) { nBytes += 1; mask >>= 1 }
    if (nBytes < 1 || nBytes > 6) return -1
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < nBytes) {
      val c = br.u(8)
      if (c < 0 || (c & 0xC0) != 0x80) return -1
      v = (v << 6) | (c & 0x3F)
      i += 1
    }
    v
  }

  private val fixedRates = Array(0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
    32000, 44100, 48000, 96000)

  /** One subframe's samples into `out`; returns false on any malformed
    * structure. `bps` already includes the +1 for a side channel. */
  private def subframe(br: BitReader, n: Int, bps0: Int, out: Array[Int]): Boolean = {
    if (br.u(1) != 0) return false // mandatory zero pad bit
    val typ = br.u(6)
    if (typ < 0) return false
    var wasted = 0
    if (br.u(1) == 1) { val q = br.unary(); if (q < 0) return false; wasted = q + 1 }
    val bps = bps0 - wasted
    if (bps <= 0 || bps > 32) return false

    def residual(order: Int): Boolean = {
      val method = br.u(2)
      if (method != 0 && method != 1) return false
      val pBits = if (method == 0) 4 else 5
      val escape = (1 << pBits) - 1
      val partOrder = br.u(4)
      if (partOrder < 0) return false
      val nParts = 1 << partOrder
      if (n % nParts != 0) return false
      var p = 0
      var idx = order
      while (p < nParts) {
        val count = (n >> partOrder) - (if (p == 0) order else 0)
        if (count < 0) return false
        val param = br.u(pBits)
        if (param < 0) return false
        var i = 0
        if (param == escape) {
          val raw = br.u(5)
          if (raw < 0) return false
          while (i < count) {
            out(idx) = if (raw == 0) 0 else br.s(raw)
            idx += 1; i += 1
          }
          if (br.pos > br.end) return false
        } else {
          while (i < count) {
            val q = br.unary()
            if (q < 0) return false
            val r = if (param == 0) 0 else br.u(param)
            if (r < 0) return false
            val u = (q.toLong << param) | r
            out(idx) = ((u >>> 1) ^ -(u & 1L)).toInt // zigzag
            idx += 1; i += 1
          }
        }
        p += 1
      }
      true
    }

    val ok: Boolean =
      if (typ == 0) { // CONSTANT
        val v = br.s(bps)
        if (br.pos > br.end) return false
        java.util.Arrays.fill(out, 0, n, v); true
      } else if (typ == 1) { // VERBATIM
        var i = 0
        while (i < n) { out(i) = br.s(bps); i += 1 }
        br.pos <= br.end
      } else if ((typ & 0x38) == 0x08 && (typ & 7) <= 4) { // FIXED, order 0-4
        val order = typ & 7
        if (order > n) return false
        var i = 0
        while (i < order) { out(i) = br.s(bps); i += 1 }
        if (br.pos > br.end) return false
        if (!residual(order)) return false
        // fixed polynomial predictors (spec §9.2.2)
        i = order
        while (i < n) {
          out(i) += (order match {
            case 0 => 0
            case 1 => out(i - 1)
            case 2 => 2 * out(i - 1) - out(i - 2)
            case 3 => 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3)
            case _ => 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) - out(i - 4)
          })
          i += 1
        }
        true
      } else if ((typ & 0x20) != 0) { // LPC, order 1-32
        val order = (typ & 0x1F) + 1
        if (order > n) return false
        var i = 0
        while (i < order) { out(i) = br.s(bps); i += 1 }
        val precM1 = br.u(4)
        if (precM1 < 0 || precM1 == 15) return false
        val prec = precM1 + 1
        val shift = br.s(5)
        if (shift < 0) return false // negative shift is forbidden (spec)
        val coefs = new Array[Int](order)
        i = 0
        while (i < order) { coefs(i) = br.s(prec); i += 1 }
        if (br.pos > br.end) return false
        if (!residual(order)) return false
        i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
          out(i) += (acc >> shift).toInt
          i += 1
        }
        true
      } else false

    if (!ok) return false
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) <<= wasted; i += 1 }
    }
    true
  }

  /** Header-only STREAMINFO read → (rate, channels, bitsPerSample,
    * totalSamples) — the metadata surface without touching a frame. */
  private[graft] def parseStreamInfo(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (!isFlac(b)) return None
    val br = new BitReader(b)
    br.pos = 32
    br.u(1) // last-metadata flag, irrelevant here
    val typ = br.u(7)
    val len = br.u(24)
    if (typ != 0 || len != 34) return None
    br.u(16); br.u(16); br.u(24); br.u(24)
    val rate = br.u(20)
    val ch = br.u(3) + 1
    val bps = br.u(5) + 1
    val total = br.u64(36)
    if (rate <= 0 || br.pos > br.end || total < 0) None else Some((rate, ch, bps, total))
  }

  /** Full stream decode → (sampleRate, channels, mono int16-range
    * samples) — the [[Multimodal.decodeWavPcm]] return shape, downmixed
    * and width-normalized identically so cross-encoding hashes agree. */
  private[graft] def decodePcm(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (!isFlac(b)) return None
    val br = new BitReader(b)
    br.pos = 32
    // metadata block walk; STREAMINFO is mandatory first (spec §8.1)
    var last = false
    var rate = 0; var nCh = 0; var bps = 0; var total = 0L
    var first = true
    while (!last) {
      val lastFlag = br.u(1)
      val typ = br.u(7)
      val len = br.u(24)
      if (lastFlag < 0 || len < 0) return None
      last = lastFlag == 1
      if (first) {
        if (typ != 0 || len != 34) return None
        br.u(16); br.u(16) // min/max block size
        br.u(24); br.u(24) // min/max frame size
        rate = br.u(20)
        nCh = br.u(3) + 1
        bps = br.u(5) + 1
        total = br.u64(36)
        br.pos += 128 // MD5
        first = false
      } else {
        br.pos += len.toLong * 8
      }
      if (br.pos > br.end) return None
    }
    if (rate <= 0 || bps < 4 || bps > 32 || nCh < 1) return None

    val mono = new scala.collection.mutable.ArrayBuffer[Int]()
    var done = false
    while (!done && br.remaining >= 40) {
      br.align()
      val frameStart = br.bytePos
      // frame header
      if (br.u(14) != 0x3FFE) { done = true }
      else if (br.u(1) != 0) { done = true }
      else {
        br.u(1) // blocking strategy
        val bsCode = br.u(4)
        val srCode = br.u(4)
        val chAsgn = br.u(4)
        val ssCode = br.u(3)
        val res = br.u(1)
        if (res != 0 || codedNumber(br) < 0) { done = true }
        else {
          val blockSize = bsCode match {
            case 1 => 192
            case c if c >= 2 && c <= 5 => 576 << (c - 2)
            case 6 => br.u(8) + 1
            case 7 => br.u(16) + 1
            case c if c >= 8 => 256 << (c - 8)
            case _ => -1
          }
          val frameRate = srCode match {
            case 0 => rate
            case c if c >= 1 && c <= 11 => fixedRates(c)
            case 12 => br.u(8) * 1000
            case 13 => br.u(16)
            case 14 => br.u(16) * 10
            case _ => -1
          }
          val frameBps = ssCode match {
            case 0 => bps
            case 1 => 8
            case 2 => 12
            case 4 => 16
            case 5 => 20
            case 6 => 24
            case _ => -1
          }
          val channels = if (chAsgn <= 7) chAsgn + 1 else if (chAsgn <= 10) 2 else -1
          val crcPos = br.bytePos
          val hdrCrc = br.u(8)
          if (blockSize <= 0 || blockSize > 65536 || frameRate <= 0 || frameBps <= 0 ||
              channels <= 0 || channels != nCh || hdrCrc < 0 ||
              hdrCrc != crc8(b, frameStart, crcPos)) { done = true }
          else {
            val chans = Array.ofDim[Int](channels, blockSize)
            var ok = true
            var c = 0
            while (ok && c < channels) {
              // a side channel carries one extra bit (spec §9.2)
              val extra = chAsgn match {
                case 8 => if (c == 1) 1 else 0 // left/side
                case 9 => if (c == 0) 1 else 0 // side/right
                case 10 => if (c == 1) 1 else 0 // mid/side
                case _ => 0
              }
              ok = subframe(br, blockSize, frameBps + extra, chans(c))
              c += 1
            }
            if (!ok) { done = true }
            else {
              br.align()
              val crcEnd = br.bytePos
              val frameCrc = br.u(16)
              if (frameCrc < 0 || frameCrc != crc16(b, frameStart, crcEnd)) { done = true }
              else {
                // undo stereo decorrelation (spec §4.2.2.3)
                chAsgn match {
                  case 8 => // left/side: right = left − side
                    var i = 0
                    while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
                  case 9 => // side/right: left = right + side
                    var i = 0
                    while (i < blockSize) { chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1 }
                  case 10 => // mid/side
                    var i = 0
                    while (i < blockSize) {
                      val side = chans(1)(i)
                      val mid = (chans(0)(i) << 1) | (side & 1)
                      chans(0)(i) = (mid + side) >> 1
                      chans(1)(i) = (mid - side) >> 1
                      i += 1
                    }
                  case _ =>
                }
                // downmix + width-normalize exactly like decodeWavPcm
                var i = 0
                while (i < blockSize) {
                  var sum = 0
                  var cc = 0
                  while (cc < channels) {
                    val v = chans(cc)(i)
                    // width-normalize to the int16 range like decodeWavPcm
                    sum += (if (frameBps < 16) v << (16 - frameBps) else v >> (frameBps - 16))
                    cc += 1
                  }
                  mono += sum / channels
                  i += 1
                }
              }
            }
          }
        }
      }
    }
    if (mono.isEmpty) None else Some((rate, nCh, mono.toArray))
  }

  // ------------------------------------------------------------------
  // Synthetic encoder — fixture side; exercises every decode path.
  // ------------------------------------------------------------------

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0L // ≤ 7 pending bits between calls
    private var nAcc = 0
    /** n ≤ 56 bits (largest field written is 36); whole-byte flushes. */
    def put(n: Int, v: Long): Unit = {
      acc = (acc << n) | (v & (if (n == 64) -1L else (1L << n) - 1))
      nAcc += n
      while (nAcc >= 8) { buf.write(((acc >>> (nAcc - 8)) & 0xFF).toInt); nAcc -= 8 }
    }
    def putUnary(q: Int): Unit = {
      var r = q
      while (r >= 32) { put(32, 0); r -= 32 }
      put(r + 1, 1) // r zeros then the terminating one
    }
    def align(): Unit = if (nAcc > 0) put(8 - nAcc, 0)
    def bytes: Array[Byte] = { require(nAcc == 0, "unaligned"); buf.toByteArray }
  }

  private def writeCodedNumber(bw: BitWriter, v: Long): Unit = {
    if (v < 0x80) bw.put(8, v)
    else {
      // count payload bits → UTF-8-style length
      var nBytes = 1
      while (v >= (1L << (6 * nBytes + (6 - nBytes))) && nBytes < 6) nBytes += 1
      val lead = (0xFF << (7 - nBytes)) & 0xFF
      bw.put(8, lead | (v >> (6 * nBytes)) & ((1 << (6 - nBytes)) - 1))
      var i = nBytes - 1
      while (i >= 0) { bw.put(8, 0x80 | ((v >> (6 * i)) & 0x3F)); i -= 1 }
    }
  }

  /** Encode 16-bit mono/stereo PCM as a REAL FLAC stream. `strategy`
    * picks the subframe/residual paths a fixture wants load-bearing:
    * "constant" (falls back to fixed-2 on non-constant blocks),
    * "verbatim", "fixed0".."fixed4", "lpc2" (a genuine order-2 LPC with
    * shift), "escape" (fixed-2 with raw-escape residual partitions),
    * "part2" (fixed-1 with partition order 2). For `channels` = 2 pass
    * interleaved samples and a `stereo` mode: "independent", "leftside",
    * "rightside", or "midside". */
  def synthetic(sampleRate: Int, samples: Array[Int], blockSize: Int = 256,
      strategy: String = "fixed2", channels: Int = 1,
      stereo: String = "independent"): Array[Byte] = {
    require(channels == 1 || channels == 2)
    require(samples.length % channels == 0)
    val nFrames = samples.length / channels
    val bw = new BitWriter()
    bw.put(8, 'f'); bw.put(8, 'L'); bw.put(8, 'a'); bw.put(8, 'C')
    // STREAMINFO, the only metadata block
    bw.put(1, 1); bw.put(7, 0); bw.put(24, 34)
    val bs = math.max(16, math.min(blockSize, 65535))
    bw.put(16, bs); bw.put(16, bs)
    bw.put(24, 0); bw.put(24, 0)
    bw.put(20, sampleRate)
    bw.put(3, channels - 1)
    bw.put(5, 15) // bps 16
    bw.put(36, nFrames.toLong)
    var i = 0
    while (i < 16) { bw.put(8, 0); i += 1 } // MD5 unset (spec allows 0)

    def rice(bw: BitWriter, res: Array[Int], from: Int, until: Int, param: Int): Unit = {
      var i = from
      while (i < until) {
        val v = res(i)
        val u = (v.toLong << 1) ^ (v.toLong >> 63) // zigzag
        bw.putUnary((u >>> param).toInt)
        if (param > 0) bw.put(param, u & ((1L << param) - 1))
        i += 1
      }
    }
    def bestParam(res: Array[Int], from: Int, until: Int): Int = {
      var maxU = 0L
      var i = from
      while (i < until) { val v = res(i); val u = (v.toLong << 1) ^ (v.toLong >> 63); if (u > maxU) maxU = u; i += 1 }
      math.min(14, math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(maxU) - 1))
    }
    // one subframe into the FRAME writer (CRC-16 must cover it)
    def writeSubframe(w: BitWriter, ch: Array[Int], n: Int, bps: Int): Unit = {
      val constant = ch.take(n).distinct.length == 1
      val strat = if (strategy == "constant" && !constant) "fixed2" else strategy
      def warmup(order: Int): Unit = {
        var i = 0
        while (i < order) { w.put(bps, ch(i).toLong & ((1L << bps) - 1)); i += 1 }
      }
      def fixedResidual(order: Int): Array[Int] = {
        val res = new Array[Int](n)
        var i = order
        while (i < n) {
          res(i) = ch(i) - (order match {
            case 0 => 0
            case 1 => ch(i - 1)
            case 2 => 2 * ch(i - 1) - ch(i - 2)
            case 3 => 3 * ch(i - 1) - 3 * ch(i - 2) + ch(i - 3)
            case _ => 4 * ch(i - 1) - 6 * ch(i - 2) + 4 * ch(i - 3) - ch(i - 4)
          })
          i += 1
        }
        res
      }
      strat match {
        case "constant" =>
          w.put(1, 0); w.put(6, 0); w.put(1, 0)
          w.put(bps, ch(0).toLong & ((1L << bps) - 1))
        case "verbatim" =>
          w.put(1, 0); w.put(6, 1); w.put(1, 0)
          var i = 0
          while (i < n) { w.put(bps, ch(i).toLong & ((1L << bps) - 1)); i += 1 }
        case "lpc2" =>
          // order-2 LPC: prediction 2·x[i−1] − x[i−2] as quantized
          // coefficients [2, −1] at shift 0 — bit-identical arithmetic
          // to fixed-2 but through the LPC decode path
          val order = 2
          w.put(1, 0); w.put(6, 0x20 | (order - 1)); w.put(1, 0)
          warmup(order)
          w.put(4, 4) // precision 5 bits
          w.put(5, 0) // shift 0
          w.put(5, 2L & 0x1F); w.put(5, -1L & 0x1F) // coefs [2, -1]
          val res = fixedResidual(order)
          w.put(2, 0); w.put(4, 0)
          val p = bestParam(res, order, n)
          w.put(4, p); rice(w, res, order, n, p)
        case "escape" =>
          val order = 2
          w.put(1, 0); w.put(6, 8 | order); w.put(1, 0)
          warmup(order)
          val res = fixedResidual(order)
          w.put(2, 0); w.put(4, 0); w.put(4, 15) // escape marker
          var maxBits = 1
          var i = order
          while (i < n) {
            var need = 1
            while (res(i) < -(1 << (need - 1)) || res(i) >= (1 << (need - 1))) need += 1
            if (need > maxBits) maxBits = need
            i += 1
          }
          w.put(5, maxBits)
          i = order
          while (i < n) { w.put(maxBits, res(i).toLong & ((1L << maxBits) - 1)); i += 1 }
        case "part2" =>
          val order = 1
          w.put(1, 0); w.put(6, 8 | order); w.put(1, 0)
          warmup(order)
          val res = fixedResidual(order)
          val partOrder = if (n % 4 == 0 && (n >> 2) > order) 2 else 0
          w.put(2, 1); w.put(4, partOrder) // 5-bit params
          val nParts = 1 << partOrder
          var p = 0
          while (p < nParts) {
            val from = if (p == 0) order else p * (n >> partOrder)
            val until = (p + 1) * (n >> partOrder)
            val pr = bestParam(res, from, until)
            w.put(5, pr); rice(w, res, from, until, pr)
            p += 1
          }
        case _ => // fixedK
          val order = strat.stripPrefix("fixed").toInt
          require(order >= 0 && order <= 4 && order < n)
          w.put(1, 0); w.put(6, 8 | order); w.put(1, 0)
          warmup(order)
          val res = fixedResidual(order)
          w.put(2, 0); w.put(4, 0)
          val p = bestParam(res, order, n)
          w.put(4, p); rice(w, res, order, n, p)
      }
    }

    var frameIdx = 0L
    var off = 0
    while (off < nFrames) {
      val n = math.min(bs, nFrames - off)
      val chAsgn = if (channels == 1) 0 else stereo match {
        case "leftside" => 8
        case "rightside" => 9
        case "midside" => 10
        case _ => 1
      }
      // header first, alone, so its CRC-8 can be appended
      val hw = new BitWriter()
      hw.put(14, 0x3FFE); hw.put(1, 0); hw.put(1, 0) // fixed blocking
      hw.put(4, 7) // explicit 16-bit blocksize-1 follows
      hw.put(4, 0) // sample rate from STREAMINFO
      hw.put(4, chAsgn)
      hw.put(3, 4) // 16 bps explicit
      hw.put(1, 0)
      writeCodedNumber(hw, frameIdx)
      hw.put(16, n - 1) // all header fields are byte-multiples; no padding
      val hdr = hw.bytes
      // whole frame (header + crc8 + subframes), CRC-16 over all of it
      val fw = new BitWriter()
      hdr.foreach(x => fw.put(8, x.toLong & 0xFF))
      fw.put(8, crc8(hdr, 0, hdr.length))
      if (channels == 1) {
        writeSubframe(fw, Array.tabulate(n)(i => samples(off + i)), n, 16)
      } else {
        val l = Array.tabulate(n)(i => samples((off + i) * 2))
        val r = Array.tabulate(n)(i => samples((off + i) * 2 + 1))
        chAsgn match {
          case 1 => writeSubframe(fw, l, n, 16); writeSubframe(fw, r, n, 16)
          case 8 =>
            writeSubframe(fw, l, n, 16)
            writeSubframe(fw, Array.tabulate(n)(i => l(i) - r(i)), n, 17)
          case 9 =>
            writeSubframe(fw, Array.tabulate(n)(i => l(i) - r(i)), n, 17)
            writeSubframe(fw, r, n, 16)
          case _ =>
            writeSubframe(fw, Array.tabulate(n)(i => (l(i) + r(i)) >> 1), n, 16)
            writeSubframe(fw, Array.tabulate(n)(i => l(i) - r(i)), n, 17)
        }
      }
      fw.align() // zero-pad to byte alignment before the frame CRC (spec)
      val frameBytes = fw.bytes
      frameBytes.foreach(x => bw.put(8, x.toLong & 0xFF))
      bw.put(16, crc16(frameBytes, 0, frameBytes.length))
      off += n
      frameIdx += 1
    }
    bw.align()
    bw.bytes
  }
}
