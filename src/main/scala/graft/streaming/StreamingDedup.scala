package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup for corpus ingestion: emit the FIRST occurrence of
  * each content hash, drop re-arrivals. The batch `Dedup.exact` resolves a
  * finished corpus; this is its ingestion-time form — a crawler feed dedups
  * as it lands, before anything downstream pays for the duplicate.
  *
  * Built on `dropDuplicatesWithinWatermark`: state is keyed by sha2(text)
  * and evicted once the event-time watermark passes a key's last-seen time,
  * so state size is bounded by the duplicate-arrival horizon (`delay`) —
  * not by corpus size, which is what makes it viable on an unbounded
  * 100 TB/day feed. The contract is correspondingly bounded: a duplicate
  * arriving AFTER the watermark has evicted its key is re-emitted (at that
  * point it's indistinguishable from new content); the batch pass is the
  * backstop, the stream pass is the cheap 99% filter.
  *
  * State is hash-partitioned by content hash across executors (RocksDB
  * state store in production); each micro-batch touches only the keys it
  * carries.
  */
object StreamingDedup {

  /** `df` must be a streaming DataFrame with an event-time column `tsCol`.
    * `delay` is the watermark expression, e.g. "10 seconds". */
  def firstSeen(df: DataFrame, textCol: String, tsCol: String, delay: String): DataFrame =
    df.withColumn("__content_hash", sha2(col(textCol), 256))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")
}
