package graft.llm

import org.apache.spark.sql.Dataset

import graft.llm.Multimodal.Media

/** Image + video curation signals (round 13) — the visual siblings of
  * [[AudioStats]]. Both are pure map stages over the decode kernels the
  * near-dup family already carries, and every signal is INTEGER-exact
  * so the DuckDB oracles replay them bit-for-bit. */
object ImageStats {

  /** Per-image admission signals: `mean_luma` (Σg / n, integer div),
    * min/max, `dark`/`bright` pixel counts (the blank/burned-out
    * filters a scraped image corpus runs first), and `edges` — the
    * count of horizontal neighbor pairs with |Δg| ≥ edgeThresh, the
    * cheap sharpness/busyness proxy (a near-constant image scores ~0
    * and is curation-worthless no matter its subject). */
  case class Stats(doc_id: Long, n_px: Long, mean_luma: Long, min_luma: Int,
      max_luma: Int, dark: Long, bright: Long, edges: Long)

  /** The per-blob kernel behind [[stats]], shared with pipeline
    * compositions that carry their own keys (doc_id is filled by the
    * caller). */
  private[graft] def signalsOf(media: Array[Byte], darkBelow: Int = 32,
      brightAbove: Int = 223, edgeThresh: Int = 8): Stats =
    Multimodal.imageGrayOf(media) match {
      case Some((w, h, px)) if px.nonEmpty =>
        var sum = 0L
        var mn = 255; var mx = 0
        var dark = 0L; var bright = 0L; var edges = 0L
        var i = 0
        while (i < px.length) {
          val g = px(i)
          sum += g
          if (g < mn) mn = g
          if (g > mx) mx = g
          if (g < darkBelow) dark += 1
          if (g > brightAbove) bright += 1
          if (i % w != w - 1 && math.abs(px(i + 1) - g) >= edgeThresh) edges += 1
          i += 1
        }
        Stats(-1L, px.length.toLong, sum / px.length, mn, mx, dark, bright, edges)
      case _ => Stats(-1L, 0L, 0L, 0, 0, 0L, 0L, 0L)
    }

  def stats(ds: Dataset[Media], darkBelow: Int = 32, brightAbove: Int = 223,
      edgeThresh: Int = 8): Dataset[Stats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map(m =>
      signalsOf(m.media, darkBelow, brightAbove, edgeThresh).copy(doc_id = m.doc_id)))
  }
}

object VideoStats {

  /** Scene-cut accounting over sampled frames: consecutive frame
    * dHashes, a cut = Hamming distance ≥ cutThreshold. The standard
    * cheap shot-boundary signal — dHash is brightness-invariant, so
    * fades don't false-trigger, while a shot change rewrites the
    * gradient field and lights up half the bits. `sum_hamming` is the
    * total frame-to-frame churn (static-screen recordings score ~0 and
    * get curated out before any expensive model sees them). */
  case class Scenes(doc_id: Long, n_frames: Int, n_cuts: Long, sum_hamming: Long)

  def sceneCuts(ds: Dataset[Media], sampleFrames: Int = 12,
      cutThreshold: Int = 16): Dataset[Scenes] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { m =>
      Multimodal.videoFramesSampled(m.media, sampleFrames) match {
        case Some((w, h, frames)) =>
          val hashes = frames.iterator
            .flatMap { case (_, luma) => Multimodal.dHash64(w, h, luma) }.toArray
          var cuts = 0L
          var sum = 0L
          var i = 1
          while (i < hashes.length) {
            val d = java.lang.Long.bitCount(hashes(i - 1) ^ hashes(i))
            sum += d
            if (d >= cutThreshold) cuts += 1
            i += 1
          }
          Scenes(m.doc_id, hashes.length, cuts, sum)
        case None => Scenes(m.doc_id, 0, 0L, 0L)
      }
    })
  }
}
