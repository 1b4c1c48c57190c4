package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, processed batch-wise with `mapPartitions`.
  *
  * The decode step is a DETERMINISTIC STUB — the image/audio codecs are not
  * in this container. What is real and load-bearing for a 100 TB pipeline:
  * the schema (binary payload + typed metadata), the partition-parallel
  * batch shape (one decoder init per partition, streamed records), and the
  * frame-sampling fanout as a generator expression. Swapping the stub body
  * for a javacv/ffmpeg call changes no plan shape.
  */
object Multimodal {

  case class Media(doc_id: Long, media: Array[Byte], mime: String)
  case class MediaMeta(doc_id: Long, byte_len: Long, width: Int, height: Int, n_frames: Int)

  /** Batch decode → metadata. mapPartitions so a real decoder is initialized
    * once per partition, not per record. */
  def decodeMeta(ds: Dataset[Media]): Dataset[MediaMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // real impl: decoder init here (once per partition)
      it.map { m =>
        val len = m.media.length.toLong
        // STUB decode: deterministic fake dimensions derived from content length
        MediaMeta(m.doc_id, len, 1 + (len % 640).toInt, 1 + (len % 480).toInt, 1 + (len % 16).toInt)
      }
    }
  }

  /** Frame sampling: n_frames evenly-spaced byte offsets per media row —
    * the video-frame-extraction fanout as a codegen'd generator (the real
    * decoder would emit frame tensors at these offsets). */
  def sampleFrames(meta: DataFrame): DataFrame =
    meta
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1)))
      .withColumn("byte_offset", col("frame_idx") * (col("byte_len") / col("n_frames")).cast("long"))
}
