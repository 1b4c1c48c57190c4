package graft.llm

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, processed batch-wise with `mapPartitions`.
  *
  * The decode step is REAL for the pure-JVM-parseable families — BMP and
  * PNM (PPM/PGM) image headers, RIFF/WAVE PCM audio — and a DETERMINISTIC
  * STUB for codec formats (JPEG/PNG decode, MP3, H.264) whose libraries are
  * not in this container. What is load-bearing for a 100 TB pipeline either
  * way: the schema (binary payload + typed metadata), the partition-parallel
  * batch shape (one decoder init per partition, streamed records), and the
  * frame-sampling fanout as a generator expression. Swapping the stub body
  * for a javacv/ffmpeg call changes no plan shape.
  */
object Multimodal {

  case class Media(doc_id: Long, media: Array[Byte], mime: String)
  case class MediaMeta(doc_id: Long, byte_len: Long, width: Int, height: Int, n_frames: Int)
  case class AudioMeta(doc_id: Long, byte_len: Long, sample_rate: Int, channels: Int,
      n_samples: Long, duration_ms: Long)

  // ---- real header parsers (no native deps, header-only reads) ----

  /** BMP (Windows DIB with BITMAPINFOHEADER): 'BM' magic, int32-LE width at
    * byte 18, int32-LE height at 22 — negative height means top-down row
    * order, so dimensions are |height|. Header-only: never touches the
    * pixel array. */
  private[graft] def parseBmp(b: Array[Byte]): Option[(Int, Int)] =
    if (b != null && b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      Some((bb.getInt(18), math.abs(bb.getInt(22))))
    } else None

  /** PNM (PPM "P3"/"P6", PGM "P2"/"P5"): ASCII header `magic w h` with
    * '#'-to-newline comments allowed between tokens. */
  private[graft] def parsePnm(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 2 || b(0) != 'P' || !"2356".contains(b(1).toChar)) return None
    var i = 2
    def nextInt(): Option[Int] = {
      // skip whitespace and comments
      var in = false
      var v = 0
      while (i < b.length) {
        val c = b(i).toChar
        if (!in && c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c.isDigit) { in = true; v = v * 10 + (c - '0'); i += 1 }
        else if (in) return Some(v)
        else if (c.isWhitespace) i += 1
        else return None
      }
      if (in) Some(v) else None
    }
    for (w <- nextInt(); h <- nextInt()) yield (w, h)
  }

  /** RIFF/WAVE PCM: walks the word-aligned chunk list for 'fmt ' (channels,
    * sample rate, bits/sample, block align) and 'data' (payload size);
    * n_samples = data size / block align. Tolerates a truncated payload —
    * only the declared sizes are read, never the samples. */
  private[graft] def parseWav(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b == null || b.length < 12) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var rate = 0
    var channels = 0
    var blockAlign = 0
    var bits = 0
    var dataLen = -1L
    while (pos + 8 <= b.length && (rate == 0 || dataLen < 0)) {
      val id = new String(b, pos, 4, "US-ASCII")
      val sz = bb.getInt(pos + 4).toLong & 0xFFFFFFFFL
      if (id == "fmt " && pos + 24 <= b.length) {
        channels = bb.getShort(pos + 10)
        rate = bb.getInt(pos + 12)
        blockAlign = bb.getShort(pos + 20)
        bits = bb.getShort(pos + 22)
      } else if (id == "data") dataLen = sz
      // advance in LONG arithmetic and require forward progress: a
      // malformed size field (0xFFFFFFF8 → step 0, or near-2^31 → int
      // overflow to a negative pos) must end the walk, not hang the task
      // or index out of bounds — corrupt headers are normal scraped input
      val next = pos.toLong + 8L + sz + (sz & 1L) // chunks are word-aligned
      pos = if (next <= pos || next > Int.MaxValue) b.length else next.toInt
    }
    if (rate > 0 && channels > 0 && blockAlign > 0 && dataLen >= 0)
      Some((rate, channels, bits, dataLen / blockAlign))
    else None
  }

  // ---- deterministic fixture builders (tests + oracle queries construct
  //      real files, then the parsers above must read the fields back) ----

  /** Minimal valid BMP: 54-byte header (BITMAPINFOHEADER) + 4 stub pixel
    * bytes. The declared dimensions are real header fields — a parser that
    * does not read offsets 18/22 cannot fake the roundtrip. */
  def syntheticBmp(width: Int, height: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(58).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(58).putInt(0).putInt(54) // file header
    b.putInt(40).putInt(width).putInt(height) // DIB: size, width, height
    b.putShort(1).putShort(24).putInt(0).putInt(4) // planes, bpp, compression, image size
    b.putInt(2835).putInt(2835).putInt(0).putInt(0) // ppm resolution, palette
    b.putInt(0) // stub pixel bytes
    b.array()
  }

  /** Minimal PPM (P6) with a comment line in the header and no pixel
    * payload beyond one stub byte. */
  def syntheticPpm(width: Int, height: Int): Array[Byte] =
    s"P6\n# graft fixture\n$width $height\n255\n".getBytes("US-ASCII") ++ Array[Byte](0)

  /** Canonical 44-byte WAV header declaring `nSamples` PCM samples; the
    * sample payload itself is omitted (parsers read declared sizes only). */
  def syntheticWav(sampleRate: Int, channels: Int, bitsPerSample: Int, nSamples: Long): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataLen = nSamples * blockAlign
    val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt((36 + dataLen).toInt)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1) // PCM
    b.putShort(channels.toShort).putInt(sampleRate)
    b.putInt(sampleRate * blockAlign) // byte rate
    b.putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen.toInt)
    b.array()
  }

  /** Batch decode → image metadata. mapPartitions so a real decoder is
    * initialized once per partition, not per record. BMP and PNM parse
    * their actual headers; other mimes take the documented deterministic
    * stub (fake dimensions derived from content length) until a codec
    * library is available. Still images report n_frames = 1. */
  def decodeMeta(ds: Dataset[Media]): Dataset[MediaMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // real impl for codec formats: decoder init here (once per partition)
      it.map { m =>
        val len = if (m.media == null) 0L else m.media.length.toLong
        val parsed = m.mime match {
          case "image/bmp" => parseBmp(m.media)
          case "image/x-portable-pixmap" | "image/x-portable-graymap" => parsePnm(m.media)
          case _ => None
        }
        parsed match {
          case Some((w, h)) => MediaMeta(m.doc_id, len, w, h, 1)
          case None =>
            // STUB decode: deterministic fake dimensions from content length
            MediaMeta(m.doc_id, len, 1 + (len % 640).toInt, 1 + (len % 480).toInt, 1 + (len % 16).toInt)
        }
      }
    }
  }

  /** Batch decode → PCM audio metadata (real RIFF/WAVE chunk walk);
    * non-WAV bytes yield a zeroed row rather than failing the job —
    * same no-NPE-mid-job posture as the rest of the engine. */
  def decodeAudioMeta(ds: Dataset[Media]): Dataset[AudioMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { m =>
      val len = if (m.media == null) 0L else m.media.length.toLong
      parseWav(m.media) match {
        case Some((rate, ch, _, n)) =>
          AudioMeta(m.doc_id, len, rate, ch, n, n * 1000L / rate)
        case None => AudioMeta(m.doc_id, len, 0, 0, 0L, 0L)
      }
    })
  }

  /** Frame sampling: n_frames evenly-spaced byte offsets per media row —
    * the video-frame-extraction fanout as a codegen'd generator (the real
    * decoder would emit frame tensors at these offsets). */
  def sampleFrames(meta: DataFrame): DataFrame =
    meta
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1)))
      .withColumn("byte_offset", col("frame_idx") * (col("byte_len") / col("n_frames")).cast("long"))
}
