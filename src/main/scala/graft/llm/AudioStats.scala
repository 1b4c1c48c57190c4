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
}
