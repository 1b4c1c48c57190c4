package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** SRT / WebVTT cue walk + the audio-stats kernel (round 13). */
class SubtitleSpec extends AnyFunSuite {

  test("timestamps: both separators, MM:SS form, malformed -> -1") {
    assert(Subtitles.parseTimestamp("01:02:03,456") == 3723456L)
    assert(Subtitles.parseTimestamp("01:02:03.456") == 3723456L)
    assert(Subtitles.parseTimestamp("02:03.456") == 123456L)
    assert(Subtitles.parseTimestamp(" 00:00:00,000 ") == 0L)
    assert(Subtitles.parseTimestamp("1:2:3,45") == -1L, "ms must be 3 digits")
    assert(Subtitles.parseTimestamp("nonsense") == -1L)
    assert(Subtitles.parseTimestamp("::,123") == -1L)
  }

  // the q_subtitle_cues fixture formulas, verbatim
  private def subText(id: Long): String = {
    val nC = (2 + id % 4).toInt
    val cueList = (0 until nC).map { i =>
      val start = (id % 500) * 10 + i * 2000
      val end = start + 500 + (id * 7 + i * 13) % 1500
      val lines = Seq(s"Line ${(id + i) % 97} <i>em</i>") ++
        (if ((id + i) % 3 == 0) Seq(s"and ${(id * 3 + i) % 89}") else Nil)
      (start, end, lines)
    }
    Subtitles.synthetic(cueList, vtt = id % 2 == 1,
      vttSettings = id % 4 == 1, vttIds = id % 4 == 3)
  }

  test("cue fields hold across the id sweep; NOTE/id/settings are invisible") {
    for (id <- 0L until 120L) {
      val cues = Subtitles.parseCues(subText(id))
      val nC = (2 + id % 4).toInt
      assert(cues.length == nC, s"cue count at id=$id (the VTT NOTE block must not cue)")
      cues.foreach { case (i, st, en, tx) =>
        val start = (id % 500) * 10 + i * 2000
        assert(st == start && en == start + 500 + (id * 7 + i * 13) % 1500,
          s"timing at id=$id i=$i")
        val expect = s"Line ${(id + i) % 97} <i>em</i>" +
          (if ((id + i) % 3 == 0) s" and ${(id * 3 + i) % 89}" else "")
        assert(tx == expect, s"multi-line space join at id=$id i=$i")
      }
    }
  }

  test("cue walk: BOM, bare-EOF tail, corrupt timing follows the prefix rule") {
    val vtt = "\uFEFF" + subText(1L)
    assert(Subtitles.parseCues(vtt).length == 3, "BOM'd WEBVTT parses")
    assert(Subtitles.parseCues(null).isEmpty)
    assert(Subtitles.parseCues("just some prose\nwith lines\n").isEmpty,
      "no arrow -> no cues")
    val srt = subText(0L)
    // corrupt the SECOND cue's arrow: the first survives
    val broken = srt.replaceFirst("(?s)(--> .*?)-->", "$1==>")
    val kept = Subtitles.parseCues(broken)
    assert(kept.length == 1, "prefix cue survives a later corrupt timing line")
    // truncation anywhere never throws
    for (c <- Seq(3, 10, srt.length / 2, srt.length - 2))
      Subtitles.parseCues(srt.take(c))
    // end < start is structural nonsense -> walk stops
    assert(Subtitles.parseCues("1\n00:00:05,000 --> 00:00:01,000\nx\n").isEmpty)
  }

  test("audio stats: hand-computed signals, cross-encoding identity, undecodable row") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    // hand case: [100, -100, 0, 0, 0, 0] window=2 thresh=60 clip=90
    val wav = Multimodal.syntheticWavPcm(8000, Array(100, -100, 0, 0, 0, 0))
    val one = AudioStats.stats(
      spark.createDataset(Seq(Multimodal.Media(1L, wav, "audio/wav"))),
      window = 2, silenceThresh = 60, clipLevel = 90).collect().head
    assert(one.n_samples == 6 && one.peak == 100, "n/peak")
    assert(one.clipped == 2, "|s| >= 90 twice")
    assert(one.silence_windows == 2, "windows (0,0) twice; (100,-100) mean 100 is loud")
    assert(one.mean_abs == (100 + 100) / 6, "integer-div loudness")
    assert(one.zero_crossings == 2, "+100 -> -100 -> 0 alternates twice (0 is non-negative)")
    // the eight lossless encodings agree sample-for-sample
    val samples = Array.tabulate(600)(j => ((j * 37) % 3001) - 1500)
    val stats8 = (0L until 8L).map { id =>
      val m = graft.queries.LlmQueries.encodeAudioCross(id, samples)
      AudioStats.stats(spark.createDataset(Seq(m))).collect().head
        .copy(doc_id = 0L)
    }
    assert(stats8.distinct.size == 1, "stats identical across all 8 encodings")
    // undecodable bytes -> total accounting, not a dropped row
    val junk = AudioStats.stats(spark.createDataset(Seq(
      Multimodal.Media(9L, "not audio".getBytes, "audio/wav")))).collect().head
    assert(junk.n_samples == 0 && junk.peak == 0, "null-ish row for undecodable input")
  }
}
