package graft.llm

import org.apache.spark.sql.Dataset

import graft.llm.Multimodal.Media

/** Audio curation signals (round 13): the audio sibling of the text
  * quality gate. Before an audio corpus is worth transcribing or
  * embedding, the cheap per-file admission signals are: is it silence,
  * is it clipped, how loud, how busy. All four fall out of one pass
  * over the PCM the engine already decodes for near-dup hashing
  * ([[Multimodal.audioPcmOf]] — WAV all widths, FLAC, AIFF/AIFF-C, AU,
  * G.711), and all four are INTEGER-exact so the DuckDB oracle replays
  * them bit-for-bit:
  *
  *  - `peak`            — max |s| (int16 domain);
  *  - `clipped`         — samples with |s| ≥ clipLevel (consecutive
  *                        full-scale runs are how lossy re-encodes of
  *                        hot masters present);
  *  - `silence_windows` — fixed windows whose mean |s| (integer div)
  *                        is below the threshold — the VAD-shaped
  *                        dead-air signal;
  *  - `mean_abs`        — Σ|s| / n (integer div), the loudness proxy
  *                        (RMS needs a sqrt; the admission decision
  *                        doesn't);
  *  - `zero_crossings`  — sign alternations (negative vs non-negative),
  *                        the classic cheap spectral-busyness proxy.
  *
  * A pure map stage over the scan, like every decode kernel here;
  * undecodable bytes emit a null-ish row (n_samples 0) rather than
  * vanishing, so corpus accounting stays total.
  */
object AudioStats {

  case class Stats(doc_id: Long, n_samples: Long, peak: Int, clipped: Long,
      silence_windows: Long, mean_abs: Long, zero_crossings: Long)

  def stats(ds: Dataset[Media], window: Int = 30, silenceThresh: Int = 100,
      clipLevel: Int = 32760): Dataset[Stats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { m =>
      Multimodal.audioPcmOf(m.media) match {
        case Some((_, _, s)) if s.nonEmpty =>
          var peak = 0
          var clipped = 0L
          var sumAbs = 0L
          var zc = 0L
          var i = 0
          var winSum = 0L
          var silence = 0L
          while (i < s.length) {
            val a = math.abs(s(i))
            if (a > peak) peak = a
            if (a >= clipLevel) clipped += 1
            sumAbs += a
            if (i > 0 && ((s(i - 1) < 0) != (s(i) < 0))) zc += 1
            winSum += a
            if ((i + 1) % window == 0) {
              if (winSum / window < silenceThresh) silence += 1
              winSum = 0L
            }
            i += 1
          }
          Stats(m.doc_id, s.length.toLong, peak, clipped, silence,
            sumAbs / s.length, zc)
        case _ => Stats(m.doc_id, 0L, 0, 0L, 0L, 0L, 0L)
      }
    })
  }

  /** One voice-activity segment: [start_frame, end_frame] inclusive,
    * with the frame grid fixed at `frameLen` samples; `n_active` counts
    * the active frames inside (merged gaps are inactive frames the
    * hangover rule bridged). Millisecond bounds are integer arithmetic
    * on the decoder's sample rate. */
  case class VadSegment(doc_id: Long, seg_idx: Int, start_frame: Long,
      end_frame: Long, n_frames: Long, n_active: Long,
      start_ms: Long, end_ms: Long)

  /** Energy-based voice-activity segmentation (round 14): the
    * speech-pipeline admission operator — before audio is worth
    * transcribing, an ASR corpus run wants "where is the speech", both
    * to drop dead air and to cut long files at silence boundaries.
    * Classic frame-energy VAD with a hangover: the mono PCM (same
    * shared decode as the near-dup hash — WAV all widths, FLAC,
    * AIFF/AIFF-C, AU, G.711) is cut into fixed `frameLen`-sample
    * frames (the tail partial frame is dropped — a fixed grid is what
    * makes the oracle exact); a frame is ACTIVE when its mean |s|
    * (integer division) reaches `energyThresh`; active runs separated
    * by at most `mergeGap` inactive frames merge into one segment (the
    * hangover — speech has sub-200 ms stops that are not boundaries).
    *
    * Everything is integer-exact, so the DuckDB oracle replays the
    * whole decision — frame energies, the threshold, and the
    * gap-tolerant island merge (lag + running-start-count form).
    *
    * Scale shape: a pure flatMap over the media scan, segments out,
    * bytes never shuffle; state per task is one frame accumulator.
    * Undecodable or sub-frame audio emits nothing (corrupt-input
    * posture; [[stats]] keeps the accounting row). */
  def vadSegments(ds: Dataset[Media], frameLen: Int = 160,
      energyThresh: Int = 200, mergeGap: Int = 1): Dataset[VadSegment] = {
    val spark = ds.sparkSession
    import spark.implicits._
    require(frameLen > 0 && energyThresh >= 0 && mergeGap >= 0)
    ds.mapPartitions(_.flatMap { m =>
      decodeRegions(m.media, frameLen, energyThresh, mergeGap) match {
        case Some((rate, regions)) =>
          regions.zipWithIndex.map { case ((start, end, nAct), i) =>
            VadSegment(m.doc_id, i, start, end, end - start + 1, nAct,
              start * frameLen * 1000L / rate,
              (end + 1) * frameLen * 1000L / rate)
          }
        case None => Nil
      }
    })
  }

  /** Shared island walk: frame energies → merged active regions
    * (start, end inclusive, n_active), plus the sample rate. None when
    * undecodable or shorter than one frame. */
  private def decodeRegions(media: Array[Byte], frameLen: Int,
      energyThresh: Int, mergeGap: Int): Option[(Int, Seq[(Long, Long, Long)])] =
    Multimodal.audioPcmOf(media) match {
      case Some((rate, _, s)) if rate > 0 && s.length >= frameLen =>
        val nFrames = s.length / frameLen
        val out = Seq.newBuilder[(Long, Long, Long)]
        var segStart = -1L
        var lastActive = -1L
        var nAct = 0L
        def close(): Unit = if (segStart >= 0) {
          out += ((segStart, lastActive, nAct))
          segStart = -1L; nAct = 0L
        }
        var f = 0
        while (f < nFrames) {
          var sum = 0L
          var i = f * frameLen
          val end = i + frameLen
          while (i < end) { sum += math.abs(s(i)); i += 1 }
          if (sum / frameLen >= energyThresh) {
            if (segStart >= 0 && f - lastActive > mergeGap + 1) close()
            if (segStart < 0) segStart = f
            lastActive = f
            nAct += 1
          }
          f += 1
        }
        close()
        Some((rate, out.result()))
      case _ => None
    }

  /** One transcription-ready chunk: a slice of a speech region, capped
    * at `maxFrames`. `region_idx` ties chunks back to the silence-split
    * region they came from. */
  case class AsrChunk(doc_id: Long, chunk_idx: Int, region_idx: Int,
      start_frame: Long, end_frame: Long, n_frames: Long,
      start_ms: Long, end_ms: Long)

  /** ASR chunking (round 14): the step between VAD and a transcription
    * model — long audio must be cut into bounded pieces WITHOUT cutting
    * through speech. Deterministic two-level rule (each level exactly
    * replayable in SQL): split at every silence of more than
    * `gapSplit` inactive frames (the same island walk as [[vadSegments]]
    * with `gapSplit` as the hangover), then hard-split any region
    * longer than `maxFrames` on the frame grid FROM THE REGION START
    * (a region of span S yields ceil(S / maxFrames) chunks) — greedy
    * per-segment packing was rejected exactly because a running-reset
    * fold has no window-function replay, and the grid rule loses
    * nothing an ASR consumer cares about. Pure flatMap over the scan,
    * one frame accumulator of state. */
  def asrChunks(ds: Dataset[Media], frameLen: Int = 160,
      energyThresh: Int = 200, gapSplit: Int = 5, maxFrames: Int = 1500)
      : Dataset[AsrChunk] = {
    val spark = ds.sparkSession
    import spark.implicits._
    require(maxFrames > 0 && gapSplit >= 0)
    ds.mapPartitions(_.flatMap { m =>
      decodeRegions(m.media, frameLen, energyThresh, gapSplit) match {
        case Some((rate, regions)) =>
          var chunkIdx = 0
          regions.zipWithIndex.flatMap { case ((start, end, _), ri) =>
            val span = end - start + 1
            val n = ((span + maxFrames - 1) / maxFrames).toInt
            (0 until n).map { c =>
              val cs = start + c.toLong * maxFrames
              val ce = math.min(end, cs + maxFrames - 1)
              val chunk = AsrChunk(m.doc_id, chunkIdx, ri, cs, ce, ce - cs + 1,
                cs * frameLen * 1000L / rate, (ce + 1) * frameLen * 1000L / rate)
              chunkIdx += 1
              chunk
            }
          }
        case None => Nil
      }
    })
  }

  // ------------------------------------------------------------------
  // Spectral fingerprint (round 15) — the frequency-domain sibling of
  // [[Multimodal.audioHash64]]'s time envelope. The shape is Haitsma &
  // Kalker 2002 ("A Highly Robust Audio Fingerprinting System"): per
  // frame, band energies; per (frame, band), one sign bit from the
  // double difference (energy gradient along frequency, differenced
  // along time) — 32 bits a frame, near-dups found by Hamming distance
  // over frame hashes ([[graft.llm.Dedup.hammingPairs64]] consumes the
  // column directly). The deliberate deviation: HK's Bark-scaled FFT
  // bands are replaced by WALSH–HADAMARD sequency coefficients, so the
  // whole kernel is INTEGER-exact — a 64-point WHT is adds and
  // subtracts of int16 samples (|coef| ≤ 2^21, energies ≤ 2^42, no
  // float anywhere), any engine replays it bit-for-bit, and Walsh
  // sequency orders by zero-crossing count exactly like frequency
  // orders sinusoids. DC (coefficient 0) is excluded; uniform gain
  // scales every energy by the same factor, so the sign bits — hence
  // the fingerprint — are VOLUME-INVARIANT by construction.
  // ------------------------------------------------------------------

  /** One fingerprint frame: 32 energy-gradient sign bits in the low
    * half of `hash32`. Frames are consecutive non-overlapping
    * `frameLen`-sample blocks; the first block only primes the time
    * difference, so `frame_idx` starts at 1. */
  case class SpectralFrame(doc_id: Long, frame_idx: Int, hash32: Long)

  /** In-place fast Walsh–Hadamard transform, natural (Hadamard) order:
    * out(m) = Σ_j in(j)·(−1)^popcount(m AND j). Length must be a power
    * of two. */
  private[graft] def whtInPlace(buf: Array[Long]): Unit = {
    val n = buf.length
    var h = 1
    while (h < n) {
      var i = 0
      while (i < n) {
        var j = i
        while (j < i + h) {
          val a = buf(j); val b = buf(j + h)
          buf(j) = a + b; buf(j + h) = a - b
          j += 1
        }
        i += 2 * h
      }
      h *= 2
    }
  }

  /** PCM samples → per-frame 32-bit spectral hashes. Bit m of frame n
    * (n ≥ 1) is set iff
    * (E(n,m+1) − E(n,m+2)) − (E(n−1,m+1) − E(n−1,m+2)) > 0,
    * where E(n,k) is the squared WHT coefficient k of frame n — the HK
    * double-difference over sequency bands 1..33. Needs ≥ 2 complete
    * frames; the int16 domain guarantees every intermediate fits a
    * Long with > 20 bits to spare. */
  private[graft] def spectralHashes(s: Array[Int], frameLen: Int): Seq[(Int, Long)] = {
    val nFrames = s.length / frameLen
    if (nFrames < 2) return Nil
    val out = Seq.newBuilder[(Int, Long)]
    var prev: Array[Long] = null
    var n = 0
    while (n < nFrames) {
      val buf = new Array[Long](frameLen)
      var j = 0
      while (j < frameLen) { buf(j) = s(n * frameLen + j).toLong; j += 1 }
      whtInPlace(buf)
      val e = new Array[Long](34)
      var m = 1
      while (m <= 33 && m < frameLen) { e(m) = buf(m) * buf(m); m += 1 }
      if (prev != null) {
        var hash = 0L
        var b = 0
        while (b < 32) {
          val d = (e(b + 1) - e(b + 2)) - (prev(b + 1) - prev(b + 2))
          if (d > 0) hash |= 1L << b
          b += 1
        }
        out += ((n, hash))
      }
      prev = e
      n += 1
    }
    out.result()
  }

  /** Batch kernel: decode (the shared [[Multimodal.audioPcmOf]]
    * family — WAV/FLAC/AIFF/AU/G.711) → frame fingerprints. A pure
    * map stage like every decode kernel here; undecodable or
    * too-short audio yields no rows. */
  def spectralFingerprint(ds: Dataset[Media], frameLen: Int = 64): Dataset[SpectralFrame] = {
    require(frameLen >= 64 && (frameLen & (frameLen - 1)) == 0,
      "frameLen must be a power of two >= 64 (bands 1..33 must exist)")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { m =>
      Multimodal.audioPcmOf(m.media) match {
        case Some((_, _, s)) =>
          spectralHashes(s, frameLen).map { case (n, h) =>
            SpectralFrame(m.doc_id, n, h)
          }
        case None => Nil
      }
    })
  }
}
