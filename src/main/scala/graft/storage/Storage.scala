package graft.storage

import org.apache.spark.sql.DataFrame

/** The uniform storage abstraction (SURVEY §1.3): every backend exposes
  * topics of envelope messages (graft.model.Envelope). Mirrors the
  * reference's Storage class hierarchy (kafi/storage.py:13-88) reduced to
  * the engine-relevant surface; shell/functional/addon operators take the
  * DataFrames these methods return.
  */
trait Storage {

  // ---- admin (kafi/storage_admin.py:11-53, fs_admin.py:57-87) ----

  def createTopic(topic: String, partitions: Int = 1): Unit
  def deleteTopic(topic: String): Unit
  def exists(topic: String): Boolean
  /** Topic names matching a glob pattern (kafi/storage.py:325-330). */
  def listTopics(pattern: String = "*"): Seq[String]
  def partitions(topic: String): Int

  // ---- data plane ----

  /** Append messages. Input needs `value`; `key`/`partition`/`timestamp`/
    * `headers` optional — partition defaults to the hash-of-key partitioner,
    * offsets are assigned past the high watermark (fs_producer.py:26-70).
    *
    * CONTRACT: single writer per topic. Offset assignment reads the high
    * watermark then appends, so two concurrent producers on one topic can
    * assign duplicate offsets (the reference is a single-process library
    * with the same implicit contract). FileStorage enforces it with an
    * advisory per-topic lock file; a broker-backed impl gets it from the
    * broker's own partition-leader serialization. */
  def produce(topic: String, df: DataFrame): Unit

  /** Full-log read; compose with offset/ts predicates for seeks
    * (fs_consumer.py:39-144 semantics, pushed into the scan). */
  def read(topic: String): DataFrame

  // ---- offsets / groups (fs_admin.py:156-261, 371-415) ----

  /** (low, high) per partition. */
  def watermarks(topic: String): DataFrame
  def commit(group: String, topic: String, offsets: Map[Int, Long]): Unit
  def committed(group: String, topic: String): Map[Int, Long]
}
