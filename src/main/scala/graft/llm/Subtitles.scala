package graft.llm

import org.apache.spark.sql.Dataset

import graft.llm.Multimodal.Media

/** Subtitle/caption parsing (round 13): SRT and WebVTT — the text half
  * of a video training pair. A caption-aligned video corpus stores the
  * transcript as sidecar cue files (YouTube-style scrapes, WebDataset
  * shards pair `key.mp4` with `key.vtt`), so "align text to video" is
  * a cue walk long before it is ASR. Both formats are line-structured
  * text: blank-line-separated blocks, a `start --> end` timing line
  * (SRT uses comma-milliseconds, VTT uses dot and allows MM:SS), and
  * payload lines. Dispatch is by content (the WEBVTT magic), VTT NOTE/
  * STYLE/REGION blocks skip whole, cue settings after the arrow are
  * ignored, and a malformed block ends the walk with the cues parsed
  * so far (the prefix rule; never a throw).
  *
  * A flatMap kernel like the container walks: one sidecar blob in, N
  * cues out, nothing shuffles. Cue text keeps its inline markup —
  * [[Warc.htmlText]] composes downstream when a clean transcript is
  * wanted (q_subtitle_cues demonstrates the composition).
  *
  * Reference scope: kafi has no media/subtitle surface; LLM-pipeline
  * extension.
  */
object Subtitles {

  /** One cue. `cue_idx` is the emission order (SRT's own numbering is
    * NOT trusted — real files renumber badly; the spec field is parsed
    * and discarded). */
  case class Cue(doc_id: Long, cue_idx: Int, start_ms: Long, end_ms: Long, text: String)

  /** "HH:MM:SS,mmm" / "HH:MM:SS.mmm" / "MM:SS.mmm" → milliseconds, or
    * -1 on malformed input. */
  private[graft] def parseTimestamp(s: String): Long = {
    val t = s.trim
    val sep = t.lastIndexOf(',') max t.lastIndexOf('.')
    if (sep < 0) return -1L
    val ms = t.substring(sep + 1)
    if (ms.length != 3 || !ms.forall(_.isDigit)) return -1L
    val parts = t.substring(0, sep).split(":")
    if (parts.length < 2 || parts.length > 3 || !parts.forall(p => p.nonEmpty && p.forall(_.isDigit)))
      return -1L
    val h = if (parts.length == 3) parts(0).toLong else 0L
    val m = parts(if (parts.length == 3) 1 else 0).toLong
    val sec = parts(if (parts.length == 3) 2 else 1).toLong
    ((h * 60 + m) * 60 + sec) * 1000 + ms.toLong
  }

  /** Cue walk over SRT or WebVTT text. Multi-line payloads join with a
    * single space (the transcript posture — cue line breaks are layout,
    * not meaning). */
  private[graft] def parseCues(raw: String): Seq[(Int, Long, Long, String)] = {
    if (raw == null) return Nil
    try {
      val isVtt = raw.startsWith("WEBVTT") || raw.startsWith("\uFEFFWEBVTT")
      val lines = raw.split("\r\n|\n|\r", -1)
      val out = Seq.newBuilder[(Int, Long, Long, String)]
      var i = 0
      if (isVtt) {
        // header block: WEBVTT line + anything until the first blank
        while (i < lines.length && lines(i).trim.nonEmpty) i += 1
      }
      var idx = 0
      var broken = false
      while (!broken && i < lines.length) {
        while (i < lines.length && lines(i).trim.isEmpty) i += 1
        if (i < lines.length) {
          // VTT comment/metadata blocks skip whole
          val head = lines(i).trim
          if (isVtt && (head.startsWith("NOTE") || head.startsWith("STYLE") ||
              head.startsWith("REGION"))) {
            while (i < lines.length && lines(i).trim.nonEmpty) i += 1
          } else {
            // optional identifier/number line before the timing line
            var timing = lines(i)
            if (!timing.contains("-->") && i + 1 < lines.length && lines(i + 1).contains("-->")) {
              i += 1; timing = lines(i)
            }
            val arrow = timing.indexOf("-->")
            if (arrow < 0) broken = true
            else {
              val start = parseTimestamp(timing.substring(0, arrow))
              // cue settings after the end timestamp (VTT) stop at whitespace
              val tail = timing.substring(arrow + 3).trim
              val endTok = tail.split("\\s+", 2)(0)
              val end = parseTimestamp(endTok)
              if (start < 0 || end < 0 || end < start) broken = true
              else {
                i += 1
                val text = new StringBuilder
                while (i < lines.length && lines(i).trim.nonEmpty) {
                  if (text.nonEmpty) text.append(' ')
                  text.append(lines(i).trim)
                  i += 1
                }
                out += ((idx, start, end, text.toString))
                idx += 1
              }
            }
          }
        }
      }
      out.result()
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** Sidecar blobs → cues, a pure flatMap kernel. */
  def cues(ds: Dataset[Media]): Dataset[Cue] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { m =>
      val s = if (m.media == null) null else new String(m.media, "UTF-8")
      parseCues(s).map { case (i, st, en, tx) => Cue(m.doc_id, i, st, en, tx) }
    })
  }

  // ------------------------------------------------------------------
  // Fixture builders
  // ------------------------------------------------------------------

  private def fmtTs(ms: Long, vtt: Boolean): String = {
    val h = ms / 3600000
    val m = (ms % 3600000) / 60000
    val s = (ms % 60000) / 1000
    val r = ms % 1000
    f"$h%02d:$m%02d:$s%02d${if (vtt) "." else ","}$r%03d"
  }

  /** An SRT or WebVTT file from (startMs, endMs, lines). The VTT form
    * plants a NOTE block, per-cue identifiers on demand, and cue
    * settings after the arrow; the SRT form numbers blocks 1..n. */
  def synthetic(cueList: Seq[(Long, Long, Seq[String])], vtt: Boolean,
      vttSettings: Boolean = false, vttIds: Boolean = false): String = {
    val sb = new StringBuilder
    if (vtt) {
      sb.append("WEBVTT - graft fixture\n\n")
      sb.append("NOTE\nthis block must not become a cue\n\n")
    }
    cueList.zipWithIndex.foreach { case ((st, en, ls), i) =>
      if (vtt && vttIds) sb.append(s"cue-$i\n")
      if (!vtt) sb.append(s"${i + 1}\n")
      sb.append(fmtTs(st, vtt)).append(" --> ").append(fmtTs(en, vtt))
      if (vtt && vttSettings) sb.append(" align:start position:10%")
      sb.append('\n')
      ls.foreach(l => sb.append(l).append('\n'))
      sb.append('\n')
    }
    sb.toString
  }
}
