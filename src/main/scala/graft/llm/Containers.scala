package graft.llm

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Dataset

import graft.llm.Multimodal.Media

/** STRUCTURAL container metadata walks (round 13): ISO-BMFF (MP4/MOV —
  * the container nearly every scraped video arrives in) and Ogg (the
  * free-codec audio container). Both formats are self-describing — box
  * sizes + 4CC types, page capture patterns + lacing — with NO normative
  * lookup tables, so a clean-room walk is verifiable by construction:
  * a parsing mistake surfaces as an absent field or a None, never a
  * silently wrong value (the property that gates what this engine
  * implements; see COVERAGE.md's round-13 decision record).
  *
  * Reference scope: kafi treats media payloads as opaque bytes
  * (kafi/helpers.py read/write paths); these walks are the
  * training-data-pipeline extension the assignment calls for — at
  * 100 TB, duration/dimension/sample accounting is the admission
  * filter that runs BEFORE any expensive decode, so it must be a pure
  * map stage over the bytes already in the scan, which both of these
  * are (used from [[decodeMp4Meta]]/[[decodeOggMeta]] mapPartitions
  * kernels; no shuffle, media bytes never move).
  *
  * Corrupt-input posture: identical to every other decoder here —
  * bounded reads, explicit size validation, None on structural
  * failure, never a throw (MediaFuzzSpec sweeps both surfaces).
  */
object Containers {

  /** MP4 metadata: (doc_id, container bytes, video width/height from the
    * vide-handler trak's tkhd, presentation duration from mvhd, trak
    * count, video sample count from stsz, and the video codec 4CC from
    * the stsd's first sample entry — avc1/hev1/av01/… is the admission
    * signal that routes a corpus row to the right decode pool). Zero/null
    * fields when the moov carries no video trak. The AVI walk emits the
    * same shape (codec = the strh fccHandler). */
  case class Mp4Meta(doc_id: Long, byte_len: Long, width: Int, height: Int,
      duration_ms: Long, n_tracks: Int, n_samples: Long, codec: String)

  /** Ogg metadata: codec identified from the BOS packet of the FIRST
    * stream ("vorbis" / "opus" / "unknown"), its declared channels and
    * rate (for Opus the granule clock is ALWAYS 48 kHz regardless of the
    * OpusHead input rate, so that is what `sample_rate` reports),
    * `n_samples` = the stream's final granule position, and the page
    * count of the whole file. */
  case class OggMeta(doc_id: Long, byte_len: Long, codec: String,
      sample_rate: Int, channels: Int, n_samples: Long, n_pages: Int)

  // ------------------------------------------------------------------
  // ISO-BMFF (ISO/IEC 14496-12 box structure)
  // ------------------------------------------------------------------

  /** Box walk → (width, height, durationMs, nTracks, videoSampleCount).
    *
    * The walk is the ISO/IEC 14496-12 size discipline exactly: 32-bit
    * size + 4CC, size==1 → 64-bit largesize follows, size==0 → to end
    * of enclosing box; children parse only inside container boxes the
    * walk understands (moov/trak/mdia/minf/stbl), everything else is
    * skipped by size — which is what makes the format safe to walk
    * without a registry of every box type. mvhd v0 (32-bit
    * timescale/duration) and v1 (64-bit) both parse; width/height are
    * the 16.16 fixed-point tail of the vide-handler trak's tkhd; the
    * video sample count is that trak's stsz entry count. Requires a
    * structurally complete moov with mvhd; anything else → None. */
  private[graft] def parseMp4(b: Array[Byte]): Option[(Int, Int, Long, Int, Long, String)] = {
    if (b == null || b.length < 16) return None
    try {
      val bb = ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN)
      def u32(p: Long): Long = bb.getInt(p.toInt) & 0xFFFFFFFFL
      // walk children of [start, end); f(type, payloadStart, payloadEnd);
      // returns false on any structural violation
      def walk(start: Long, end: Long)(f: (String, Long, Long) => Boolean): Boolean = {
        var p = start
        while (p + 8 <= end) {
          val sz0 = u32(p)
          val typ = new String(b, p.toInt + 4, 4, "ISO-8859-1")
          var hdr = 8L
          val sz =
            if (sz0 == 1L) {
              if (p + 16 > end) return false
              hdr = 16L; bb.getLong(p.toInt + 8)
            } else if (sz0 == 0L) end - p
            else sz0
          if (sz < hdr || p + sz > end) return false
          if (!f(typ, p + hdr, p + sz)) return false
          p += sz
        }
        p == end
      }
      var durMs = -1L
      var nTracks = 0
      var vw = 0; var vh = 0; var vSamples = 0L
      var vCodec: String = null
      var sawMoov = false
      val ok = walk(0L, b.length.toLong) { (t, s, e) =>
        if (t == "moov") {
          sawMoov = true
          walk(s, e) { (t2, s2, e2) =>
            t2 match {
              case "mvhd" =>
                if (e2 - s2 < 20) false
                else {
                  val ver = b(s2.toInt) & 0xFF
                  if (ver == 1) {
                    if (e2 - s2 < 32) false
                    else {
                      val ts = u32(s2 + 20)
                      val dur = bb.getLong(s2.toInt + 24)
                      if (ts == 0 || dur < 0) false else { durMs = dur * 1000L / ts; true }
                    }
                  } else {
                    val ts = u32(s2 + 12)
                    val dur = u32(s2 + 16)
                    if (ts == 0) false else { durMs = dur * 1000L / ts; true }
                  }
                }
              case "trak" =>
                nTracks += 1
                var handler = ""
                var tw = 0; var th = 0; var tSamples = 0L
                var tCodec: String = null
                val okT = walk(s2, e2) { (t3, s3, e3) =>
                  t3 match {
                    case "tkhd" =>
                      if (e3 - s3 < 8) false
                      else {
                        tw = (u32(e3 - 8) >> 16).toInt
                        th = (u32(e3 - 4) >> 16).toInt
                        true
                      }
                    case "mdia" =>
                      walk(s3, e3) { (t4, s4, e4) =>
                        t4 match {
                          case "hdlr" =>
                            if (e4 - s4 < 12) false
                            else { handler = new String(b, s4.toInt + 8, 4, "ISO-8859-1"); true }
                          case "minf" =>
                            walk(s4, e4) { (t5, s5, e5) =>
                              if (t5 == "stbl")
                                walk(s5, e5) { (t6, s6, e6) =>
                                  if (t6 == "stsz") {
                                    if (e6 - s6 < 12) false
                                    else { tSamples = u32(s6 + 8); true }
                                  } else if (t6 == "stsd") {
                                    // fullbox(4) + entry_count(4) + first
                                    // sample entry's [size][4CC]
                                    if (e6 - s6 >= 16 && u32(s6 + 4) >= 1)
                                      tCodec = new String(b, s6.toInt + 12, 4, "ISO-8859-1")
                                    true
                                  } else true
                                }
                              else true
                            }
                          case _ => true
                        }
                      }
                    case _ => true
                  }
                }
                if (okT && handler == "vide") {
                  vw = tw; vh = th; vSamples = tSamples; vCodec = tCodec
                }
                okT
              case _ => true
            }
          }
        } else true
      }
      if (ok && sawMoov && durMs >= 0) Some((vw, vh, durMs, nTracks, vSamples, vCodec))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  def decodeMp4Meta(ds: Dataset[Media]): Dataset[Mp4Meta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { m =>
      val len = if (m.media == null) 0L else m.media.length.toLong
      parseMp4(m.media) match {
        case Some((w, h, dur, nt, ns, codec)) => Mp4Meta(m.doc_id, len, w, h, dur, nt, ns, codec)
        case None => Mp4Meta(m.doc_id, len, 0, 0, 0L, 0, 0L, null)
      }
    })
  }

  /** iTunes-style MP4/M4A tag extraction (round 13): the
    * moov/udta/meta/ilst chain — `meta` is a FULL box (4 version/flags
    * bytes before its children, the classic ISO-BMFF parsing trap),
    * `ilst` items are typed by their own 4CC (0xA9+"nam"/"ART"/"alb"
    * for title/artist/album), each holding a `data` box whose 8-byte
    * head (type indicator + locale) precedes the raw UTF-8 value.
    * Returns canonical TITLE/ARTIST/ALBUM keys so [[Multimodal.audioTags]]
    * can collapse all three tag families onto one schema. Advisory
    * posture throughout. */
  private[graft] def mp4Tags(b: Array[Byte]): Map[String, String] = {
    if (b == null || b.length < 16) return Map.empty
    try {
      val bb = ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN)
      def u32(p: Long): Long = bb.getInt(p.toInt) & 0xFFFFFFFFL
      val out = scala.collection.mutable.LinkedHashMap[String, String]()
      def walk(start: Long, end: Long)(f: (String, Long, Long) => Unit): Unit = {
        var p = start
        while (p + 8 <= end) {
          val sz0 = u32(p)
          val typ = new String(b, p.toInt + 4, 4, "ISO-8859-1")
          var hdr = 8L
          val sz =
            if (sz0 == 1L) { if (p + 16 > end) return; hdr = 16L; bb.getLong(p.toInt + 8) }
            else if (sz0 == 0L) end - p
            else sz0
          if (sz < hdr || p + sz > end) return
          f(typ, p + hdr, p + sz)
          p += sz
        }
      }
      val keyOf = Map("©nam" -> "TITLE", "©ART" -> "ARTIST", "©alb" -> "ALBUM")
      walk(0L, b.length.toLong) { (t, s, e) =>
        if (t == "moov") walk(s, e) { (t2, s2, e2) =>
          if (t2 == "udta") walk(s2, e2) { (t3, s3, e3) =>
            if (t3 == "meta" && e3 - s3 >= 4) walk(s3 + 4, e3) { (t4, s4, e4) =>
              if (t4 == "ilst") walk(s4, e4) { (t5, s5, e5) =>
                keyOf.get(t5).foreach { key =>
                  walk(s5, e5) { (t6, s6, e6) =>
                    if (t6 == "data" && e6 - s6 >= 8 && !out.contains(key))
                      out(key) = new String(b, s6.toInt + 8, (e6 - s6 - 8).toInt, "UTF-8")
                  }
                }
              }
            }
          }
        }
      }
      out.toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  // ------------------------------------------------------------------
  // MP4 fixture builder (a REAL box tree, every knob formula-driven)
  // ------------------------------------------------------------------

  private def be32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
    out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
  }
  private def be64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    be32(out, v >>> 32); be32(out, v & 0xFFFFFFFFL)
  }
  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    be32(out, 8L + payload.length)
    out.write(typ.getBytes("ISO-8859-1"), 0, 4)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }
  private def bytes(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(); f(out); out.toByteArray
  }

  /** A structurally complete MP4: ftyp (`brands` compatible brands),
    * moov [mvhd v0/v1, video trak (tkhd 16.16 dims, mdhd, hdlr "vide",
    * minf/vmhd/dinf/stbl with stsd+stts+stsz+stsc+stco), optional audio
    * trak (hdlr "soun", 16 samples), optional `junkLen` unknown "udta"
    * box], optional `freeLen` free box, mdat of `mdatLen`. Exact size
    * (the byte_len oracle's closed form, pinned by ContainerSpec):
    * 16 + 4·brands + 8 + (108 | 120 for v1) + (440 + 4·nVideoSamples)
    * + (450 if audio) + (8 + junkLen if junk) + (8 + freeLen if free)
    * + 8 + mdatLen. */
  def syntheticMp4(brands: Int, mvhdV1: Boolean, timescale: Int, duration: Long,
      w: Int, h: Int, nVideoSamples: Int, audioTrack: Boolean,
      mdatLen: Int, freeLen: Int = 0, junkLen: Int = 0,
      videoCodec: String = "avc1",
      tags: Seq[(String, String)] = Nil): Array[Byte] = {
    require(brands >= 1 && timescale > 0 && duration >= 0 && nVideoSamples >= 0)
    require(videoCodec.length == 4)
    require(tags.forall(_._1.length == 4))
    val allBrands = Seq("isom", "mp42", "avc1", "iso2", "mp41").take(brands)
    val ftyp = box("ftyp", bytes { o =>
      o.write("isom".getBytes("ISO-8859-1")); be32(o, 0x200)
      allBrands.foreach(br => o.write(br.getBytes("ISO-8859-1")))
    })
    val mvhd = box("mvhd", bytes { o =>
      if (mvhdV1) {
        o.write(1); o.write(0); o.write(0); o.write(0)
        be64(o, 0L); be64(o, 0L) // ctime, mtime
        be32(o, timescale); be64(o, duration)
      } else {
        be32(o, 0L) // v0, no flags
        be32(o, 0L); be32(o, 0L)
        be32(o, timescale); be32(o, duration)
      }
      be32(o, 0x00010000L); o.write(1); o.write(0) // rate 1.0, volume 1.0
      o.write(0); o.write(0); be64(o, 0L) // reserved
      // unity matrix
      Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L).foreach(be32(o, _))
      (0 until 6).foreach(_ => be32(o, 0L)) // pre_defined
      be32(o, 2L) // next_track_ID
    })
    def tkhd(trackId: Int, tw: Int, th: Int) = box("tkhd", bytes { o =>
      be32(o, 7L) // v0, flags: enabled+in-movie+in-preview
      be32(o, 0L); be32(o, 0L); be32(o, trackId.toLong); be32(o, 0L)
      be32(o, duration) // track duration in movie timescale (v0 ⇒ fits)
      be64(o, 0L) // reserved
      o.write(0); o.write(0); o.write(0); o.write(0) // layer, alternate_group
      o.write(0); o.write(0); o.write(0); o.write(0) // volume, reserved
      Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L).foreach(be32(o, _))
      be32(o, tw.toLong << 16); be32(o, th.toLong << 16)
    })
    def mdhd = box("mdhd", bytes { o =>
      be32(o, 0L); be32(o, 0L); be32(o, 0L)
      be32(o, timescale); be32(o, duration)
      o.write(0x55); o.write(0xC4); o.write(0); o.write(0) // und language
    })
    def hdlr(kind: String) = box("hdlr", bytes { o =>
      be32(o, 0L); be32(o, 0L)
      o.write(kind.getBytes("ISO-8859-1"), 0, 4)
      (0 until 3).foreach(_ => be32(o, 0L)) // reserved
      o.write('g'); o.write(0) // 2-byte name
    })
    val dinf = box("dinf", box("dref", bytes { o =>
      be32(o, 0L); be32(o, 1L)
      o.write(box("url ", bytes(b2 => be32(b2, 1L))), 0, 12) // self-contained
    }))
    def stbl(entry4cc: String, entryLen: Int, n: Int, sampleLen: Int => Long) = {
      val stsd = box("stsd", bytes { o =>
        be32(o, 0L); be32(o, 1L)
        o.write(box(entry4cc, new Array[Byte](entryLen)), 0, 8 + entryLen)
      })
      val stts = box("stts", bytes { o =>
        be32(o, 0L); be32(o, 1L); be32(o, n.toLong)
        be32(o, if (n == 0) 0L else duration / math.max(1, n))
      })
      val stsz = box("stsz", bytes { o =>
        be32(o, 0L); be32(o, 0L); be32(o, n.toLong)
        (0 until n).foreach(i => be32(o, sampleLen(i)))
      })
      val stsc = box("stsc", bytes { o =>
        be32(o, 0L); be32(o, 1L); be32(o, 1L); be32(o, math.max(1, n).toLong); be32(o, 1L)
      })
      val stco = box("stco", bytes { o => be32(o, 0L); be32(o, 1L); be32(o, 0L) })
      box("stbl", stsd ++ stts ++ stsz ++ stsc ++ stco)
    }
    val vmhd = box("vmhd", bytes { o => be32(o, 1L); be64(o, 0L) })
    val smhd = box("smhd", bytes { o => be32(o, 1L); be32(o, 0L) })
    val videoTrak = box("trak", tkhd(1, w, h) ++ box("mdia",
      mdhd ++ hdlr("vide") ++ box("minf",
        vmhd ++ dinf ++ stbl(videoCodec, 78, nVideoSamples, i => 100L + i % 50))))
    val audioTrak =
      if (!audioTrack) Array.emptyByteArray
      else box("trak", tkhd(2, 0, 0) ++ box("mdia",
        mdhd ++ hdlr("soun") ++ box("minf",
          smhd ++ dinf ++ stbl("mp4a", 28, 16, i => 60L + i))))
    val junk = if (junkLen == 0) Array.emptyByteArray
      else box("udta", Array.tabulate[Byte](junkLen)(i => (i * 13).toByte))
    // iTunes-style tag chain: udta → meta (FULL box: 4 version/flags
    // bytes) → hdlr 'mdir' + ilst → ©xxx items each holding a data box
    val tagUdta =
      if (tags.isEmpty) Array.emptyByteArray
      else {
        val items = tags.map { case (cc, v) =>
          box(cc, box("data", bytes { o =>
            be32(o, 1L); be32(o, 0L) // UTF-8 type indicator + locale
            val vb = v.getBytes("UTF-8")
            o.write(vb, 0, vb.length)
          }))
        }.reduce(_ ++ _)
        val mdirHdlr = box("hdlr", bytes { o =>
          be32(o, 0L); be32(o, 0L)
          o.write("mdir".getBytes("ISO-8859-1"), 0, 4)
          (0 until 3).foreach(_ => be32(o, 0L))
        })
        box("udta", box("meta",
          Array[Byte](0, 0, 0, 0) ++ mdirHdlr ++ box("ilst", items)))
      }
    val moov = box("moov", mvhd ++ videoTrak ++ audioTrak ++ junk ++ tagUdta)
    val free = if (freeLen == 0) Array.emptyByteArray
      else box("free", Array.tabulate[Byte](freeLen)(i => (i * 7).toByte))
    val mdat = box("mdat", Array.tabulate[Byte](mdatLen)(i => (i * 31).toByte))
    ftyp ++ moov ++ free ++ mdat
  }

  // ------------------------------------------------------------------
  // AVI (RIFF 'AVI ' — the OpenDML/VfW layout, structural like ISO-BMFF)
  // ------------------------------------------------------------------

  /** AVI metadata via the RIFF chunk walk → (width, height, durationMs,
    * nStreams, totalFrames). Width/height and the frame/stream counts
    * come from the `avih` MainAVIHeader (fixed field offsets inside a
    * fixed-size chunk — dwMicroSecPerFrame@0, dwTotalFrames@16,
    * dwStreams@24, dwWidth@32, dwHeight@36); duration =
    * totalFrames · microSecPerFrame. Chunks are skipped by size with
    * RIFF's odd-length pad byte, LIST chunks recurse by list type, and
    * only `hdrl` needs understanding — `movi`/`idx1`/unknown chunks
    * skip. Structural failure → None, same posture as [[parseMp4]]. */
  private[graft] def parseAvi(b: Array[Byte]): Option[(Int, Int, Long, Int, Long, String)] = {
    if (b == null || b.length < 24) return None
    try {
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      def fourcc(p: Int): String = new String(b, p, 4, "ISO-8859-1")
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
      val riffLen = bb.getInt(4).toLong & 0xFFFFFFFFL
      val end = math.min(b.length.toLong, 8L + riffLen)
      var w = 0; var h = 0; var durMs = -1L; var streams = 0; var frames = 0L
      var codec: String = null
      // walk chunks in [start, end); returns false on structural violation
      def walk(start: Long, stop: Long): Boolean = {
        var p = start
        while (p + 8 <= stop) {
          val cc = fourcc(p.toInt)
          val len = bb.getInt(p.toInt + 4).toLong & 0xFFFFFFFFL
          val body = p + 8
          if (body + len > stop) return false
          if (cc == "LIST") {
            if (len < 4) return false
            val listType = fourcc(body.toInt)
            // only hdrl needs understanding; movi/strl-from-hdrl recurse,
            // everything else (movi payload incl.) skips wholesale
            if (listType == "hdrl" || listType == "strl") {
              if (!walk(body + 4, body + len)) return false
            }
          } else if (cc == "avih") {
            if (len < 40) return false
            val mspf = bb.getInt(body.toInt).toLong & 0xFFFFFFFFL
            frames = bb.getInt(body.toInt + 16).toLong & 0xFFFFFFFFL
            streams = bb.getInt(body.toInt + 24)
            w = bb.getInt(body.toInt + 32)
            h = bb.getInt(body.toInt + 36)
            durMs = frames * mspf / 1000L
          } else if (cc == "strh") {
            // the FIRST vids stream's handler 4CC is the codec signal
            if (len >= 8 && codec == null && fourcc(body.toInt) == "vids")
              codec = fourcc(body.toInt + 4)
          }
          p = body + len + (len & 1L) // RIFF pads odd chunk bodies
        }
        p == stop
      }
      if (!walk(12L, end) || durMs < 0 || w < 0 || h < 0) None
      else Some((w, h, durMs, streams, frames, codec))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** AVI rows in the [[Mp4Meta]] shape (n_tracks = dwStreams,
    * n_samples = dwTotalFrames) — one schema for the video-container
    * admission filter regardless of container. */
  def decodeAviMeta(ds: Dataset[Media]): Dataset[Mp4Meta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { m =>
      val len = if (m.media == null) 0L else m.media.length.toLong
      parseAvi(m.media) match {
        case Some((w, h, dur, nt, ns, codec)) => Mp4Meta(m.doc_id, len, w, h, dur, nt, ns, codec)
        case None => Mp4Meta(m.doc_id, len, 0, 0, 0L, 0, 0L, null)
      }
    })
  }

  private def le32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
    out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
  }
  private def riffChunk(cc: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(cc.getBytes("ISO-8859-1"), 0, 4)
    le32(out, payload.length.toLong)
    out.write(payload, 0, payload.length)
    if (payload.length % 2 == 1) out.write(0) // RIFF pad byte
    out.toByteArray
  }
  private def riffList(listType: String, children: Array[Byte]): Array[Byte] =
    riffChunk("LIST", listType.getBytes("ISO-8859-1") ++ children)

  /** A structurally complete AVI: RIFF/AVI header, LIST hdrl [avih,
    * one video LIST strl (strh "vids" + strf), optional audio strl],
    * an unknown JUNK chunk (ODD length on demand — the pad-byte path),
    * LIST movi with `moviChunks` "00dc" chunks of `chunkLen(i)` bytes,
    * idx1. Exact size (pinned by ContainerSpec): 12 + hdrl + junk +
    * movi + idx1 where hdrl = 12 + 64 + 124 + (124 if audio),
    * junk = 8 + junkLen + (junkLen&1), movi = 12 + Σ(8 + len_i +
    * (len_i&1)), idx1 = 8 + 16·moviChunks. */
  def syntheticAvi(w: Int, h: Int, microSecPerFrame: Long, totalFrames: Long,
      audioStream: Boolean, moviChunks: Int, chunkLen: Int => Int,
      junkLen: Int = 0, videoHandler: String = "MJPG"): Array[Byte] = {
    require(w >= 0 && h >= 0 && microSecPerFrame > 0 && moviChunks >= 1)
    require(videoHandler.length == 4)
    val streams = if (audioStream) 2 else 1
    val avih = riffChunk("avih", bytes { o =>
      le32(o, microSecPerFrame); le32(o, 0L); le32(o, 0L); le32(o, 0x10L)
      le32(o, totalFrames); le32(o, 0L); le32(o, streams.toLong); le32(o, 0L)
      le32(o, w.toLong); le32(o, h.toLong)
      (0 until 4).foreach(_ => le32(o, 0L)) // dwReserved
    })
    def strl(fccType: String, handler: String, length: Long) = riffList("strl",
      riffChunk("strh", bytes { o =>
        o.write(fccType.getBytes("ISO-8859-1"), 0, 4)
        o.write(handler.getBytes("ISO-8859-1"), 0, 4)
        le32(o, 0L) // flags
        o.write(0); o.write(0); o.write(0); o.write(0) // priority, language
        le32(o, 0L) // initial frames
        le32(o, 1L); le32(o, 25L) // scale, rate
        le32(o, 0L); le32(o, length) // start, length
        le32(o, 0L); le32(o, 0L); le32(o, 0L) // sugbuf, quality, samplesize
        (0 until 4).foreach(_ => o.write(0)) // rcFrame x2 words... 8 bytes
        (0 until 4).foreach(_ => o.write(0))
      }) ++ riffChunk("strf", Array.tabulate[Byte](40)(i => (i * 3).toByte)))
    val hdrl = riffList("hdrl",
      avih ++ strl("vids", videoHandler, totalFrames) ++
        (if (audioStream) strl("auds", "    ", 16L)
         else Array.emptyByteArray))
    val junk = if (junkLen == 0) Array.emptyByteArray
      else riffChunk("JUNK", Array.tabulate[Byte](junkLen)(i => (i * 11).toByte))
    val movi = riffList("movi", (0 until moviChunks).map { i =>
      riffChunk("00dc", Array.tabulate[Byte](chunkLen(i))(j => ((j * 5 + i) % 256).toByte))
    }.reduce(_ ++ _))
    val idx1 = riffChunk("idx1", Array.tabulate[Byte](16 * moviChunks)(i => (i * 7).toByte))
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ junk ++ movi ++ idx1
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("ISO-8859-1"), 0, 4)
    le32(out, body.length.toLong)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Ogg (RFC 3533 page structure; Vorbis I / RFC 7845 ident headers)
  // ------------------------------------------------------------------

  /** Page walk → (codec, rate, channels, lastGranule, nPages).
    *
    * Structure only: capture pattern "OggS", stream version 0, header
    * type, 64-bit LE granule position, serial, sequence, CRC field
    * (READ but not verified — metadata accounting does not depend on
    * payload integrity, and skipping verification keeps this walk free
    * of any checksum table), lacing values, payload. The first BOS
    * page's packet identifies the codec: `\x01vorbis` (channels at
    * byte 11, rate LE at 12 — Vorbis I ident header) or `OpusHead`
    * (channels at 9; the granule clock is 48 kHz by definition, RFC
    * 7845 §4, so rate reports 48000). `n_samples` is the final granule
    * position of the first stream's last page — for Vorbis that is the
    * PCM sample count, for Opus the 48 kHz sample count including
    * pre-skip. A malformed page ends the walk; None unless at least
    * one full page with a BOS parsed. */
  private[graft] def parseOgg(b: Array[Byte]): Option[(String, Int, Int, Long, Int)] = {
    if (b == null || b.length < 27) return None
    try {
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      var p = 0
      var nPages = 0
      var serial0 = -1L
      var lastGranule = 0L
      var codec: String = null
      var rate = 0; var ch = 0
      var stop = false
      while (!stop && p + 27 <= b.length) {
        if (!(b(p) == 'O' && b(p + 1) == 'g' && b(p + 2) == 'g' && b(p + 3) == 'S') ||
            b(p + 4) != 0) stop = true
        else {
          val htype = b(p + 5) & 0xFF
          val granule = bb.getLong(p + 6)
          val serial = bb.getInt(p + 14) & 0xFFFFFFFFL
          val nsegs = b(p + 26) & 0xFF
          if (p + 27 + nsegs > b.length) stop = true
          else {
            var payLen = 0
            var i = 0
            while (i < nsegs) { payLen += b(p + 27 + i) & 0xFF; i += 1 }
            val payStart = p + 27 + nsegs
            if (payStart + payLen > b.length) stop = true
            else {
              nPages += 1
              if ((htype & 2) != 0 && serial0 < 0) { // first BOS page
                serial0 = serial
                // first packet = segments up to the first lacing < 255
                var pk = 0
                var j = 0
                var open = true
                while (j < nsegs && open) {
                  val l = b(p + 27 + j) & 0xFF
                  pk += l
                  if (l < 255) open = false
                  j += 1
                }
                if (pk >= 16 && b(payStart) == 1 &&
                    new String(b, payStart + 1, 6, "ISO-8859-1") == "vorbis") {
                  codec = "vorbis"
                  ch = b(payStart + 11) & 0xFF
                  rate = bb.getInt(payStart + 12)
                } else if (pk >= 12 &&
                    new String(b, payStart, 8, "ISO-8859-1") == "OpusHead") {
                  codec = "opus"
                  ch = b(payStart + 9) & 0xFF
                  rate = 48000 // the granule clock, RFC 7845 §4
                } else codec = "unknown"
              }
              if (serial == serial0 && granule >= 0) lastGranule = granule
              p = payStart + payLen
            }
          }
        }
      }
      if (nPages == 0 || codec == null) None
      else Some((codec, rate, ch, lastGranule, nPages))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Vorbis-comment / OpusTags extraction (round 13): the SECOND packet
    * of the first stream — reassembled across lacing segments and page
    * continuations — parsed as the comment header both codecs share
    * (vendor length+string, then count × (length + "KEY=value" UTF-8)).
    * Keys are canonicalized UPPER (the spec makes them case-insensitive).
    * Advisory posture: structural trouble yields the comments parsed so
    * far, never a throw. */
  private[graft] def oggComments(b: Array[Byte]): Map[String, String] = {
    if (b == null || b.length < 27) return Map.empty
    try {
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      var p = 0
      var serial0 = -1L
      var packetIdx = 0
      val pkt = new java.io.ByteArrayOutputStream()
      var second: Array[Byte] = null
      var stop = false
      while (!stop && second == null && p + 27 <= b.length) {
        if (!(b(p) == 'O' && b(p + 1) == 'g' && b(p + 2) == 'g' && b(p + 3) == 'S') ||
            b(p + 4) != 0) stop = true
        else {
          val htype = b(p + 5) & 0xFF
          val serial = bb.getInt(p + 14) & 0xFFFFFFFFL
          val nsegs = b(p + 26) & 0xFF
          if (p + 27 + nsegs > b.length) stop = true
          else {
            if ((htype & 2) != 0 && serial0 < 0) serial0 = serial
            var seg = 0
            var q = p + 27 + nsegs
            while (seg < nsegs && second == null) {
              val l = b(p + 27 + seg) & 0xFF
              if (q + l > b.length) { stop = true; seg = nsegs }
              else {
                if (serial == serial0) {
                  pkt.write(b, q, l)
                  if (l < 255) { // packet boundary
                    if (packetIdx == 1) second = pkt.toByteArray
                    packetIdx += 1
                    pkt.reset()
                  }
                }
                q += l; seg += 1
              }
            }
            p = p + 27 + nsegs + (0 until nsegs).map(i => b(p + 27 + i) & 0xFF).sum
          }
        }
      }
      if (second == null) return Map.empty
      val c = second
      val off =
        if (c.length >= 7 && c(0) == 3 &&
          new String(c, 1, 6, "ISO-8859-1") == "vorbis") 7
        else if (c.length >= 8 && new String(c, 0, 8, "ISO-8859-1") == "OpusTags") 8
        else return Map.empty
      val cb = ByteBuffer.wrap(c).order(ByteOrder.LITTLE_ENDIAN)
      if (off + 4 > c.length) return Map.empty
      val vendorLen = cb.getInt(off)
      var q = off + 4 + vendorLen
      if (vendorLen < 0 || q + 4 > c.length) return Map.empty
      val n = cb.getInt(q)
      q += 4
      val out = scala.collection.mutable.LinkedHashMap[String, String]()
      var i = 0
      while (i < n && q + 4 <= c.length) {
        val l = cb.getInt(q)
        q += 4
        if (l < 0 || q + l > c.length) return out.toMap
        val kv = new String(c, q, l, "UTF-8")
        val eq = kv.indexOf('=')
        if (eq > 0) out(kv.substring(0, eq).toUpperCase) = kv.substring(eq + 1)
        q += l
        i += 1
      }
      out.toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  def decodeOggMeta(ds: Dataset[Media]): Dataset[OggMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { m =>
      val len = if (m.media == null) 0L else m.media.length.toLong
      parseOgg(m.media) match {
        case Some((codec, rate, ch, n, pages)) =>
          OggMeta(m.doc_id, len, codec, rate, ch, n, pages)
        case None => OggMeta(m.doc_id, len, null, 0, 0, 0L, 0)
      }
    })
  }

  // ------------------------------------------------------------------
  // Ogg fixture builder (real pages, real lacing, spec CRC)
  // ------------------------------------------------------------------

  // CRC-32/MPEG-2 style: polynomial 0x04C11DB7, NOT reflected, init 0,
  // no final xor (RFC 3533 appendix). The decoder never reads this —
  // it exists so fixtures are well-formed files, and a transcription
  // slip here cannot make the walk wrong (see parseOgg's doc).
  private lazy val oggCrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) { r = (r << 1) ^ (if ((r & 0x80000000) != 0) 0x04C11DB7 else 0); k += 1 }
      t(i) = r
      i += 1
    }
    t
  }
  private def oggCrc(b: Array[Byte]): Int = {
    var c = 0
    var i = 0
    while (i < b.length) { c = (c << 8) ^ oggCrcTable(((c >>> 24) ^ (b(i) & 0xFF)) & 0xFF); i += 1 }
    c
  }

  private def oggPage(htype: Int, granule: Long, serial: Int, seq: Int,
      packets: Seq[Array[Byte]]): Array[Byte] = {
    val lacing = packets.flatMap { pk =>
      val full = pk.length / 255
      Seq.fill(full)(255) :+ (pk.length % 255)
    }
    require(lacing.length <= 255, "page overflow")
    val out = new java.io.ByteArrayOutputStream()
    out.write("OggS".getBytes("ISO-8859-1"), 0, 4)
    out.write(0); out.write(htype)
    var i = 0
    while (i < 8) { out.write(((granule >> (8 * i)) & 0xFF).toInt); i += 1 }
    i = 0
    while (i < 4) { out.write((serial >> (8 * i)) & 0xFF); i += 1 }
    i = 0
    while (i < 4) { out.write((seq >> (8 * i)) & 0xFF); i += 1 }
    val crcPos = out.size()
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(lacing.length)
    lacing.foreach(out.write)
    packets.foreach(pk => out.write(pk, 0, pk.length))
    val page = out.toByteArray
    val crc = oggCrc(page)
    i = 0
    while (i < 4) { page(crcPos + i) = ((crc >> (8 * i)) & 0xFF).toByte; i += 1 }
    page
  }

  /** A real Ogg stream: BOS page with a Vorbis or Opus ident packet,
    * `dataPages` audio pages whose payload length is `pageLen(i)` (so
    * multi-segment lacing is exercised whenever a length ≥ 255 comes
    * through), granule advancing by `granuleStep` per page, EOS flag on
    * the last. Page size = 27 + (len/255 + 1) + len; the BOS ident
    * packet is 30 bytes (vorbis) / 19 (opus). */
  def syntheticOgg(vorbis: Boolean, rate: Int, channels: Int, serial: Int,
      dataPages: Int, pageLen: Int => Int, granuleStep: Long,
      comments: Seq[(String, String)] = Nil, vendor: String = "graft"): Array[Byte] = {
    require(dataPages >= 1 && channels >= 1)
    val ident: Array[Byte] =
      if (vorbis) bytes { o =>
        o.write(1); o.write("vorbis".getBytes("ISO-8859-1"), 0, 6)
        var i = 0
        while (i < 4) { o.write(0); i += 1 } // version 0
        o.write(channels)
        i = 0
        while (i < 4) { o.write((rate >> (8 * i)) & 0xFF); i += 1 }
        i = 0
        while (i < 12) { o.write(0); i += 1 } // bitrates
        o.write(0xB8); o.write(1) // blocksizes + framing bit
      }
      else bytes { o =>
        o.write("OpusHead".getBytes("ISO-8859-1"), 0, 8)
        o.write(1); o.write(channels)
        o.write(0x38); o.write(1) // pre-skip 312
        var i = 0
        while (i < 4) { o.write((rate >> (8 * i)) & 0xFF); i += 1 } // input rate
        o.write(0); o.write(0); o.write(0) // gain + mapping family 0
      }
    val out = new java.io.ByteArrayOutputStream()
    out.write(oggPage(2, 0L, serial, 0, Seq(ident)))
    // comment header page (the packet both codecs put second): vendor +
    // count + "KEY=value" entries, vorbis with its trailing framing bit
    val seqOff = if (comments.nonEmpty) {
      val pkt = bytes { o =>
        def le(v: Int): Unit = { var i = 0; while (i < 4) { o.write((v >> (8 * i)) & 0xFF); i += 1 } }
        if (vorbis) { o.write(3); o.write("vorbis".getBytes("ISO-8859-1"), 0, 6) }
        else o.write("OpusTags".getBytes("ISO-8859-1"), 0, 8)
        val vb = vendor.getBytes("UTF-8")
        le(vb.length); o.write(vb, 0, vb.length)
        le(comments.length)
        comments.foreach { case (k, v) =>
          val kv = s"$k=$v".getBytes("UTF-8")
          le(kv.length); o.write(kv, 0, kv.length)
        }
        if (vorbis) o.write(1) // framing bit
      }
      out.write(oggPage(0, 0L, serial, 1, Seq(pkt)))
      1
    } else 0
    var pg = 0
    while (pg < dataPages) {
      val len = pageLen(pg)
      val payload = Array.tabulate[Byte](len)(j => ((j * 19 + pg * 7) % 256).toByte)
      val htype = if (pg == dataPages - 1) 4 else 0
      out.write(oggPage(htype, granuleStep * (pg + 1), serial, pg + 1 + seqOff, Seq(payload)))
      pg += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // WebP (RIFF container; VP8 / VP8L / VP8X headers — round 13)
  // ------------------------------------------------------------------

  /** WebP metadata: dims from the format-appropriate header, `format`
    * in {lossy, lossless, extended}, alpha from the VP8L header bit or
    * the VP8X flags byte, `n_frames` = ANMF chunk count (0 for a
    * still). WebP is the most common image container in a modern web
    * scrape, and ALL of this is structural — RIFF's self-describing
    * chunk sizes plus fixed-layout bitstream headers (the 3-byte VP8
    * keyframe tag + 9D 01 2A start code + 14-bit dims; VP8L's packed
    * 14-bit dims/alpha/version byte; VP8X's 24-bit canvas dims) — a
    * parsing mistake here degrades to a None, never a silently wrong
    * value. Full VP8L PIXEL decode landed in round 14 ([[Vp8l]]): its
    * prefix codes are stream-carried and its one fixed neighbor map is
    * derived from its generative rule, so it passes the COVERAGE.md
    * decision-record bar that MP3 samples did not. */
  case class WebpMeta(doc_id: Long, byte_len: Long, width: Int, height: Int,
      format: String, has_alpha: Boolean, n_frames: Int)

  /** Chunk walk → (width, height, format, hasAlpha, anmfCount).
    *
    * The FIRST chunk fixes the format, exactly as the spec orders the
    * file ("VP8 "/"VP8L" still images, "VP8X" extended); later chunks
    * are counted (ANMF) or skipped by size with RIFF's odd-length pad
    * byte. In an extended file the canvas dims come from VP8X ONLY —
    * the embedded still/frame bitstreams keep their own (sub-canvas)
    * dims and the walk must not read them; the fixture plants DIFFERENT
    * inner dims to make that load-bearing. A lossy non-keyframe first
    * chunk carries no dims → None (matches the spec: a still VP8 chunk
    * is always a keyframe). */
  private[graft] def parseWebp(b: Array[Byte]): Option[(Int, Int, String, Boolean, Int)] = {
    if (b == null || b.length < 20) return None
    try {
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      def cc(p: Int): String = new String(b, p, 4, "ISO-8859-1")
      if (cc(0) != "RIFF" || cc(8) != "WEBP") return None
      val riffLen = bb.getInt(4).toLong & 0xFFFFFFFFL
      val end = math.min(b.length.toLong, 8L + riffLen)
      var p = 12L
      var w = 0; var h = 0; var fmt: String = null
      var alpha = false; var frames = 0
      var first = true
      while (p + 8 <= end) {
        val typ = cc(p.toInt)
        val len = bb.getInt(p.toInt + 4).toLong & 0xFFFFFFFFL
        val s = p + 8
        if (s + len > end) return None
        if (first) {
          first = false
          typ match {
            case "VP8 " =>
              if (len < 10) return None
              val si = s.toInt
              val tag = (b(si) & 0xFF) | ((b(si + 1) & 0xFF) << 8) | ((b(si + 2) & 0xFF) << 16)
              if ((tag & 1) != 0) return None // interframe: no dims in a still
              if ((b(si + 3) & 0xFF) != 0x9D || (b(si + 4) & 0xFF) != 0x01 ||
                  (b(si + 5) & 0xFF) != 0x2A) return None
              w = bb.getShort(si + 6) & 0x3FFF
              h = bb.getShort(si + 8) & 0x3FFF
              fmt = "lossy"
            case "VP8L" =>
              if (len < 5 || (b(s.toInt) & 0xFF) != 0x2F) return None
              val bits = bb.getInt(s.toInt + 1)
              if (((bits >>> 29) & 7) != 0) return None // version must be 0
              w = (bits & 0x3FFF) + 1
              h = ((bits >>> 14) & 0x3FFF) + 1
              alpha = ((bits >>> 28) & 1) == 1
              fmt = "lossless"
            case "VP8X" =>
              if (len < 10) return None
              val si = s.toInt
              alpha = (b(si) & 0x10) != 0
              def u24(q: Int): Int =
                (b(q) & 0xFF) | ((b(q + 1) & 0xFF) << 8) | ((b(q + 2) & 0xFF) << 16)
              w = u24(si + 4) + 1
              h = u24(si + 7) + 1
              fmt = "extended"
            case _ => return None
          }
        } else if (typ == "ANMF") frames += 1
        p = s + len + (len & 1L)
      }
      if (fmt == null || p != end) None else Some((w, h, fmt, alpha, frames))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  def decodeWebpMeta(ds: Dataset[Media]): Dataset[WebpMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { m =>
      val len = if (m.media == null) 0L else m.media.length.toLong
      parseWebp(m.media) match {
        case Some((w, h, fmt, alpha, frames)) =>
          WebpMeta(m.doc_id, len, w, h, fmt, alpha, frames)
        case None => WebpMeta(m.doc_id, len, 0, 0, null, has_alpha = false, 0)
      }
    })
  }

  /** A structurally complete WebP.
    *   - format "lossy": VP8 chunk = 10-byte keyframe header + fillLen.
    *   - format "lossless": VP8L chunk = 5-byte header + fillLen.
    *   - format "extended": VP8X(10) then [ALPH alphaLen if alpha] then
    *     either ANIM(6) + animFrames × ANMF(16 + frameLen(i)) or a still
    *     VP8 chunk (10 + fillLen) whose OWN dims are deliberately
    *     smaller than the canvas, then [EXIF exifLen if > 0].
    * Every chunk body of odd length gets RIFF's pad byte. Exact size
    * (pinned by ContainerSpec): 12 + Σ(8 + len + len%2). */
  def syntheticWebp(format: String, w: Int, h: Int, alpha: Boolean,
      animFrames: Int, frameLen: Int => Int, fillLen: Int,
      alphaLen: Int = 0, exifLen: Int = 0): Array[Byte] = {
    require(w >= 1 && w <= 0x3FFF && h >= 1 && h <= 0x3FFF)
    def vp8Still(sw: Int, sh: Int, fill: Int): Array[Byte] = riffChunk("VP8 ", bytes { o =>
      o.write(0x10); o.write(0); o.write(0) // keyframe tag (bit0 = 0)
      o.write(0x9D); o.write(0x01); o.write(0x2A)
      o.write(sw & 0xFF); o.write((sw >> 8) & 0x3F)
      o.write(sh & 0xFF); o.write((sh >> 8) & 0x3F)
      var i = 0
      while (i < fill) { o.write((i * 13 + 5) % 256); i += 1 }
    })
    val chunks: Array[Byte] = format match {
      case "lossy" => vp8Still(w, h, fillLen)
      case "lossless" => riffChunk("VP8L", bytes { o =>
        o.write(0x2F)
        val bits = (w - 1) | ((h - 1) << 14) | (if (alpha) 1 << 28 else 0)
        le32(o, bits.toLong & 0xFFFFFFFFL)
        var i = 0
        while (i < fillLen) { o.write((i * 7 + 3) % 256); i += 1 }
      })
      case "extended" =>
        val vp8x = riffChunk("VP8X", bytes { o =>
          o.write((if (alpha) 0x10 else 0) | (if (animFrames > 0) 0x02 else 0))
          o.write(0); o.write(0); o.write(0)
          def u24(v: Int): Unit = { o.write(v & 0xFF); o.write((v >> 8) & 0xFF); o.write((v >> 16) & 0xFF) }
          u24(w - 1); u24(h - 1)
        })
        val alph = if (alpha) riffChunk("ALPH", Array.tabulate[Byte](alphaLen)(i => ((i * 3 + 1) % 256).toByte))
          else Array.emptyByteArray
        val image =
          if (animFrames > 0)
            riffChunk("ANIM", Array.tabulate[Byte](6)(_ => 0.toByte)) ++
              (0 until animFrames).map { i =>
                riffChunk("ANMF", Array.tabulate[Byte](16)(j => (j * 5).toByte) ++
                  Array.tabulate[Byte](frameLen(i))(j => ((j * 11 + i) % 256).toByte))
              }.fold(Array.emptyByteArray)(_ ++ _)
          else vp8Still(math.max(1, w / 2), math.max(1, h / 2), fillLen)
        val exif = if (exifLen > 0)
          riffChunk("EXIF", Array.tabulate[Byte](exifLen)(i => ((i * 9 + 2) % 256).toByte))
          else Array.emptyByteArray
        vp8x ++ alph ++ image ++ exif
      case other => throw new IllegalArgumentException(other)
    }
    val body = "WEBP".getBytes("ISO-8859-1") ++ chunks
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("ISO-8859-1"), 0, 4)
    le32(out, body.length.toLong)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // AVIF / HEIC (ISO-BMFF item structure — round 13)
  // ------------------------------------------------------------------

  /** AVIF/HEIC metadata: the modern still-image containers are
    * ISO-BMFF ITEM files — no moov, a `meta` FULL box holding the item
    * property container — and the admission signals live in `ispe`
    * (image spatial extents). `width`/`height` are the LARGEST ispe in
    * ipco (files carry thumbnail/alpha items with their own smaller
    * ispe — the fixture plants one so max-selection is load-bearing),
    * `brand` is the ftyp major brand routing rows to decode pools,
    * `n_props` the ipco property count. Entirely structural: box
    * sizes, FULL-box version/flags offsets, fixed-layout ispe. */
  case class AvifMeta(doc_id: Long, byte_len: Long, width: Int, height: Int,
      brand: String, n_props: Int)

  private[graft] def parseAvif(b: Array[Byte]): Option[(Int, Int, String, Int)] = {
    if (b == null || b.length < 16) return None
    try {
      val bb = ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN)
      def u32(p: Long): Long = bb.getInt(p.toInt) & 0xFFFFFFFFL
      def walk(start: Long, end: Long)(f: (String, Long, Long) => Boolean): Boolean = {
        var p = start
        while (p + 8 <= end) {
          val sz0 = u32(p)
          val typ = new String(b, p.toInt + 4, 4, "ISO-8859-1")
          var hdr = 8L
          val sz =
            if (sz0 == 1L) {
              if (p + 16 > end) return false
              hdr = 16L; bb.getLong(p.toInt + 8)
            } else if (sz0 == 0L) end - p
            else sz0
          if (sz < hdr || p + sz > end) return false
          if (!f(typ, p + hdr, p + sz)) return false
          p += sz
        }
        p == end
      }
      var brand: String = null
      var bestW = 0; var bestH = 0
      var nProps = 0
      var sawMeta = false
      val ok = walk(0L, b.length.toLong) { (t, s, e) =>
        t match {
          case "ftyp" =>
            if (e - s < 4) false
            else { brand = new String(b, s.toInt, 4, "ISO-8859-1"); true }
          case "meta" => // FULL box: 4 version/flags bytes precede children
            if (e - s < 4) false
            else {
              sawMeta = true
              walk(s + 4, e) { (t2, s2, e2) =>
                if (t2 == "iprp")
                  walk(s2, e2) { (t3, s3, e3) =>
                    if (t3 == "ipco")
                      walk(s3, e3) { (t4, s4, e4) =>
                        nProps += 1
                        if (t4 == "ispe" && e4 - s4 >= 12) {
                          val w = u32(s4 + 4).toInt
                          val h = u32(s4 + 8).toInt
                          if (w.toLong * h > bestW.toLong * bestH) { bestW = w; bestH = h }
                        }
                        true
                      }
                    else true
                  }
                else true
              }
            }
          case _ => true
        }
      }
      if (ok && brand != null && sawMeta) Some((bestW, bestH, brand, nProps)) else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  def decodeAvifMeta(ds: Dataset[Media]): Dataset[AvifMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { m =>
      val len = if (m.media == null) 0L else m.media.length.toLong
      parseAvif(m.media) match {
        case Some((w, h, brand, np)) => AvifMeta(m.doc_id, len, w, h, brand, np)
        case None => AvifMeta(m.doc_id, len, 0, 0, null, 0)
      }
    })
  }

  /** A structurally complete AVIF/HEIC item file: ftyp, meta FULL box
    * [hdlr pict, iprp[ipco[ispe main (+ thumbnail ispe on demand)
    * (+ an opaque codec-config prop of `propLen`)], ipma], iloc-shaped
    * junk], mdat. Exact sizes (pinned by ContainerSpec): ftyp
    * 16 + 4·compat; hdlr 33; ispe 20 each; prop 8 + propLen; ipco
    * 8 + Σ; iprp 8 + ipco; ipma 12 + ipmaLen; meta 12 + children;
    * mdat 8 + mdatLen. */
  def syntheticAvif(brand: String, compat: Int, w: Int, h: Int,
      thumbnail: Boolean, propLen: Int, ipmaLen: Int, mdatLen: Int): Array[Byte] = {
    require(brand.length == 4 && compat >= 0)
    val ftyp = box("ftyp", bytes { o =>
      o.write(brand.getBytes("ISO-8859-1"), 0, 4)
      be32(o, 0L)
      (0 until compat).foreach(_ => o.write("mif1".getBytes("ISO-8859-1"), 0, 4))
    })
    def ispe(iw: Int, ih: Int) = box("ispe", bytes { o =>
      be32(o, 0L); be32(o, iw.toLong); be32(o, ih.toLong)
    })
    val hdlr = box("hdlr", bytes { o =>
      be32(o, 0L); be32(o, 0L)
      o.write("pict".getBytes("ISO-8859-1"), 0, 4)
      (0 until 12).foreach(_ => o.write(0))
      o.write(0) // empty name
    })
    val props = ispe(w, h) ++
      (if (thumbnail) ispe(math.max(1, w / 8), math.max(1, h / 8)) else Array.emptyByteArray) ++
      (if (propLen > 0) box("av1C", Array.tabulate[Byte](propLen)(i => ((i * 5 + 1) % 256).toByte))
       else Array.emptyByteArray)
    val ipco = box("ipco", props)
    val iprp = box("iprp", ipco)
    val ipma = box("ipma", bytes { o =>
      be32(o, 0L)
      (0 until ipmaLen).foreach(i => o.write((i * 3) % 256))
    })
    val meta = box("meta", bytes { o =>
      be32(o, 0L) // FULL box version/flags
      o.write(hdlr, 0, hdlr.length)
      o.write(iprp, 0, iprp.length)
      o.write(ipma, 0, ipma.length)
    })
    val mdat = box("mdat", Array.tabulate[Byte](mdatLen)(i => ((i * 7 + 3) % 256).toByte))
    ftyp ++ meta ++ mdat
  }

  // ------------------------------------------------------------------
  // Matroska / WebM (EBML structure — round 13)
  // ------------------------------------------------------------------

  /** EBML walk → (width, height, durationMs, nTracks, videoBlockCount,
    * codecId) in the [[Mp4Meta]] shape — WebM is the third leg of the
    * video-container admission filter next to MP4 and AVI.
    *
    * EBML is MORE self-describing than ISO-BMFF: every element is
    * (variable-width id, variable-width size, payload), where the width
    * of both fields is declared by their own leading-zero count, so the
    * whole format parses with two VINT readers and a recursive skip —
    * no normative tables anywhere (the decision-record gate). The walk
    * honors the three size encodings a real muxer emits: minimal-width
    * VINTs, deliberately NON-minimal widths (legal EBML, used by
    * streaming muxers that reserve 8-byte sizes to patch later), and
    * the all-ones UNKNOWN size (live streams), accepted for the Segment
    * only and read to EOF.
    *
    * Fields: duration = Info's float Duration × TimestampScale (whose
    * 1 000 000 ns default applies when the element is absent), dims and
    * codec from the FIRST TrackEntry with TrackType 1 selected by type
    * — not position, the fixture swaps track order — and `n_samples` =
    * the count of Cluster SimpleBlocks whose own track-number VINT
    * routes to that video track. Anything structurally broken → None. */
  private[graft] def parseMkv(b: Array[Byte]): Option[(Int, Int, Long, Int, Long, String)] = {
    if (b == null || b.length < 8) return None
    try {
      val n = b.length.toLong
      // element-id VINT: marker bit kept (ids compare as written)
      def idAt(q: Long): (Long, Int) = {
        if (q >= n) return (-1L, 0)
        val f = b(q.toInt) & 0xFF
        if (f == 0) return (-1L, 0)
        val w = Integer.numberOfLeadingZeros(f) - 23 // f in [1,255] → 1..8
        if (w > 4 || q + w > n) return (-1L, 0)
        var v = f.toLong
        var i = 1
        while (i < w) { v = (v << 8) | (b((q + i).toInt) & 0xFF); i += 1 }
        (v, w)
      }
      // size VINT: marker stripped; all-ones payload → unknown → (-1, w)
      def sizeAt(q: Long): (Long, Int) = {
        if (q >= n) return (-2L, 0)
        val f = b(q.toInt) & 0xFF
        if (f == 0) return (-2L, 0)
        val w = Integer.numberOfLeadingZeros(f) - 23
        if (q + w > n) return (-2L, 0)
        var v = (f & (0xFF >>> w)).toLong
        var i = 1
        while (i < w) { v = (v << 8) | (b((q + i).toInt) & 0xFF); i += 1 }
        (if (v == (1L << (7 * w)) - 1) -1L else v, w)
      }
      def uintAt(q: Long, len: Long): Long = {
        var v = 0L; var i = 0L
        while (i < len) { v = (v << 8) | (b((q + i).toInt) & 0xFF); i += 1 }
        v
      }
      // children of [start, end); f(id, payloadStart, payloadEnd);
      // false on structural violation (unknown sizes are segment-only)
      def walk(start: Long, end: Long)(f: (Long, Long, Long) => Boolean): Boolean = {
        var p = start
        while (p < end) {
          val (id, iw) = idAt(p)
          if (id < 0) return false
          val (sz, sw) = sizeAt(p + iw)
          if (sz < 0) return false
          val s = p + iw + sw
          if (s + sz > end) return false
          if (!f(id, s, s + sz)) return false
          p = s + sz
        }
        p == end
      }
      // EBML header, skipped by size
      val (hid, hw) = idAt(0L)
      if (hid != 0x1A45DFA3L) return None
      val (hsz, hsw) = sizeAt(hw.toLong)
      if (hsz < 0 || hw + hsw + hsz > n) return None
      val segPos = hw + hsw + hsz
      val (sid, siw) = idAt(segPos)
      if (sid != 0x18538067L) return None
      val (ssz, ssw) = sizeAt(segPos + siw)
      if (ssz == -2L) return None
      val segStart = segPos + siw + ssw
      val segEnd = if (ssz == -1L) n else segStart + ssz
      if (segEnd > n) return None

      var durTicks = -1.0
      var tsScale = 1000000L
      var nTracks = 0
      var vNum = -1L; var vw = 0; var vh = 0; var vCodec: String = null
      val blockCounts = scala.collection.mutable.HashMap.empty[Long, Long]
      val ok = walk(segStart, segEnd) { (id, s, e) =>
        id match {
          case 0x1549A966L => // Info
            walk(s, e) { (id2, s2, e2) =>
              val len = e2 - s2
              if (id2 == 0x2AD7B1L) { tsScale = uintAt(s2, len); true }
              else if (id2 == 0x4489L) {
                if (len == 4) {
                  durTicks = java.lang.Float.intBitsToFloat(uintAt(s2, 4).toInt).toDouble; true
                } else if (len == 8) {
                  durTicks = java.lang.Double.longBitsToDouble(uintAt(s2, 8)); true
                } else false
              } else true
            }
          case 0x1654AE6BL => // Tracks
            walk(s, e) { (id2, s2, e2) =>
              if (id2 == 0xAEL) { // TrackEntry
                nTracks += 1
                var num = -1L; var typ = -1L; var codec: String = null
                var tw = 0; var th = 0
                val okE = walk(s2, e2) { (id3, s3, e3) =>
                  id3 match {
                    case 0xD7L => num = uintAt(s3, e3 - s3); true
                    case 0x83L => typ = uintAt(s3, e3 - s3); true
                    case 0x86L => codec = new String(b, s3.toInt, (e3 - s3).toInt, "ISO-8859-1"); true
                    case 0xE0L => // Video
                      walk(s3, e3) { (id4, s4, e4) =>
                        if (id4 == 0xB0L) tw = uintAt(s4, e4 - s4).toInt
                        else if (id4 == 0xBAL) th = uintAt(s4, e4 - s4).toInt
                        true
                      }
                    case _ => true
                  }
                }
                if (okE && typ == 1L && vNum < 0) {
                  vNum = num; vw = tw; vh = th; vCodec = codec
                }
                okE
              } else true
            }
          case 0x1F43B675L => // Cluster
            walk(s, e) { (id2, s2, e2) =>
              if (id2 == 0xA3L) {
                // SimpleBlock: payload leads with a track-number VINT
                // (read with the size reader, so the all-ones form —
                // track 127 in 1 byte — reads as unknown and fails the
                // walk; real muxers emit it 2-wide long before 127
                // tracks exist)
                val (tn, tw2) = sizeAt(s2)
                if (tn < 0 || tw2 <= 0 || s2 + tw2 + 3 > e2) false
                else { blockCounts(tn) = blockCounts.getOrElse(tn, 0L) + 1L; true }
              } else true
            }
          case _ => true // SeekHead, Cues, Tags, Void … skipped by size
        }
      }
      if (!ok || durTicks < 0) None
      else {
        val durMs = (durTicks * tsScale / 1e6).toLong
        Some((vw, vh, durMs, nTracks, blockCounts.getOrElse(vNum, 0L), vCodec))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Matroska rows in the [[Mp4Meta]] shape (n_samples = the video
    * track's SimpleBlock count). */
  def decodeMkvMeta(ds: Dataset[Media]): Dataset[Mp4Meta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { m =>
      val len = if (m.media == null) 0L else m.media.length.toLong
      parseMkv(m.media) match {
        case Some((w, h, dur, nt, ns, codec)) => Mp4Meta(m.doc_id, len, w, h, dur, nt, ns, codec)
        case None => Mp4Meta(m.doc_id, len, 0, 0, 0L, 0, 0L, null)
      }
    })
  }

  // EBML write side (fixtures): ids as written; size VINTs at an
  // explicit width (0 = minimal); integers at a fixed width — EBML
  // permits non-minimal integer widths, which keeps the fixture's byte
  // accounting closed-form
  private[graft] def ebmlVint(o: java.io.ByteArrayOutputStream, v: Long, w: Int): Unit = {
    val x = (1L << (7 * w)) | v
    var i = w - 1
    while (i >= 0) { o.write(((x >> (8 * i)) & 0xFF).toInt); i -= 1 }
  }
  private def ebmlMinW(v: Long): Int = {
    var w = 1
    while (v >= (1L << (7 * w)) - 1) w += 1
    w
  }
  private[graft] def ebmlElem(id: Long, payload: Array[Byte], sizeW: Int = 0): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    val idW = if (id <= 0xFFL) 1 else if (id <= 0xFFFFL) 2 else if (id <= 0xFFFFFFL) 3 else 4
    var i = idW - 1
    while (i >= 0) { o.write(((id >> (8 * i)) & 0xFF).toInt); i -= 1 }
    val w = if (sizeW == 0) ebmlMinW(payload.length.toLong) else sizeW
    ebmlVint(o, payload.length.toLong, w)
    o.write(payload, 0, payload.length)
    o.toByteArray
  }
  private[graft] def ebmlUintBytes(v: Long, w: Int): Array[Byte] =
    Array.tabulate[Byte](w)(i => ((v >> (8 * (w - 1 - i))) & 0xFF).toByte)

  /** A structurally complete WebM. Knobs (all pinned by ContainerSpec's
    * closed byte form): `segSizeMode` 0 = minimal 2-byte Segment size,
    * 1 = all-ones UNKNOWN size (read to EOF), 2 = non-minimal 8-byte
    * size; `writeScale` = false omits TimestampScale so the 1 000 000
    * default is load-bearing; `swapOrder` puts the audio TrackEntry
    * first with track number 1 (type-based selection + block routing by
    * number both load-bearing). Cluster blocks alternate video/audio
    * when an audio track exists. Exact sizes: EBML header 36; Info
    * 16/23; video entry 25, audio 24; cluster = 4 + sizeW(payload) +
    * payload, payload = 4 + Σ(6 + blockLen(c,j)). */
  def syntheticMkv(w: Int, h: Int, durationTicks: Double, timestampScale: Long,
      writeScale: Boolean, audioTrack: Boolean, swapOrder: Boolean,
      nClusters: Int, blocksPerCluster: Int => Int, blockLen: (Int, Int) => Int,
      videoCodec: String, segSizeMode: Int): Array[Byte] = {
    require(nClusters >= 1 && videoCodec.length == 5)
    require(!swapOrder || audioTrack, "swapOrder needs the audio track")
    val ebmlHeader = ebmlElem(0x1A45DFA3L, bytes { o =>
      o.write(ebmlElem(0x4286L, ebmlUintBytes(1, 1)), 0, 4)
      o.write(ebmlElem(0x42F7L, ebmlUintBytes(1, 1)), 0, 4)
      o.write(ebmlElem(0x42F2L, ebmlUintBytes(4, 1)), 0, 4)
      o.write(ebmlElem(0x42F3L, ebmlUintBytes(8, 1)), 0, 4)
      val dt = ebmlElem(0x4282L, "webm".getBytes("ISO-8859-1"))
      o.write(dt, 0, dt.length)
      o.write(ebmlElem(0x4287L, ebmlUintBytes(2, 1)), 0, 4)
      o.write(ebmlElem(0x4285L, ebmlUintBytes(2, 1)), 0, 4)
    })
    val info = ebmlElem(0x1549A966L, bytes { o =>
      if (writeScale) {
        val ts = ebmlElem(0x2AD7B1L, ebmlUintBytes(timestampScale, 3))
        o.write(ts, 0, ts.length)
      }
      val dur = ebmlElem(0x4489L,
        ebmlUintBytes(java.lang.Double.doubleToLongBits(durationTicks), 8))
      o.write(dur, 0, dur.length)
    })
    val vNum = if (swapOrder) 2L else 1L
    val aNum = if (swapOrder) 1L else 2L
    def trackEntry(num: Long, typ: Long, codec: String, sub: Array[Byte]): Array[Byte] =
      ebmlElem(0xAEL, bytes { o =>
        o.write(ebmlElem(0xD7L, ebmlUintBytes(num, 1)), 0, 3)
        o.write(ebmlElem(0x83L, ebmlUintBytes(typ, 1)), 0, 3)
        val c = ebmlElem(0x86L, codec.getBytes("ISO-8859-1"))
        o.write(c, 0, c.length)
        o.write(sub, 0, sub.length)
      })
    val videoEntry = trackEntry(vNum, 1L, videoCodec, ebmlElem(0xE0L,
      ebmlElem(0xB0L, ebmlUintBytes(w.toLong, 2)) ++
        ebmlElem(0xBAL, ebmlUintBytes(h.toLong, 2))))
    val audioEntry = if (audioTrack) trackEntry(aNum, 2L, "A_OPUS", ebmlElem(0xE1L,
      ebmlElem(0xB5L, ebmlUintBytes(
        java.lang.Float.floatToIntBits(48000f).toLong & 0xFFFFFFFFL, 4))))
      else Array.emptyByteArray
    val tracks = ebmlElem(0x1654AE6BL,
      if (swapOrder) audioEntry ++ videoEntry else videoEntry ++ audioEntry)
    val clusters = (0 until nClusters).map { ci =>
      ebmlElem(0x1F43B675L, bytes { o =>
        o.write(ebmlElem(0xE7L, ebmlUintBytes(300L + 100L * ci, 2)), 0, 4)
        val nb = blocksPerCluster(ci)
        var j = 0
        while (j < nb) {
          val tn = if (audioTrack && j % 2 == 1) aNum else vNum
          val dataLen = blockLen(ci, j)
          val blk = ebmlElem(0xA3L, bytes { bo =>
            ebmlVint(bo, tn, 1)
            bo.write(0); bo.write(16 * (j + 1)) // 2-byte timecode
            bo.write(0x80) // flags: keyframe
            var k = 0
            while (k < dataLen) { bo.write((k * 3 + ci + j) % 256); k += 1 }
          })
          o.write(blk, 0, blk.length)
          j += 1
        }
      })
    }.fold(Array.emptyByteArray)(_ ++ _)
    val segPayload = info ++ tracks ++ clusters
    val out = new java.io.ByteArrayOutputStream()
    out.write(ebmlHeader, 0, ebmlHeader.length)
    // Segment id + size in the requested encoding
    out.write(0x18); out.write(0x53); out.write(0x80); out.write(0x67)
    segSizeMode match {
      case 0 => ebmlVint(out, segPayload.length.toLong, 2)
      case 1 => out.write(0xFF) // unknown size: to EOF
      case 2 => ebmlVint(out, segPayload.length.toLong, 8)
      case other => throw new IllegalArgumentException(s"segSizeMode $other")
    }
    out.write(segPayload, 0, segPayload.length)
    out.toByteArray
  }
}
