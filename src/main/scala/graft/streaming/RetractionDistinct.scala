package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Retraction-emitting stateful distinct — the genuinely hard part of the
  * reference's semantics under Structured Streaming (SURVEY §7.4 item 1):
  * Spark's update mode emits upserts only, but the reference's Z-set
  * `distinct` (topologynode.py:278-294) must emit +1 when a record becomes
  * present and −1 when retractions drive it out — that delta stream is what
  * `to_debezium` (topologynode.py:1148-1167) publishes as CDC.
  *
  * Implemented with flatMapGroupsWithState: state = integrated weight per
  * record; a micro-batch's summed delta flips presence → emit ±1, else
  * nothing. State TTL (processing-time timeout) is the `expire` analogue
  * (topologynode.py:573-648) bounding state size.
  *
  * Scale note: state is partitioned by record key across executors (RocksDB
  * state store in production); each micro-batch touches only keys present
  * in the batch.
  */
object RetractionDistinct {

  case class Delta(record: String, weight: Long)

  /** input: (record, weight) deltas; output: (record, ±1) presence changes. */
  def apply(deltas: Dataset[Delta], ttlMs: Long = -1): Dataset[Delta] = {
    val spark = deltas.sparkSession
    import spark.implicits._
    deltas
      .groupByKey(_.record)
      .flatMapGroupsWithState[Long, Delta](
        OutputMode.Append(),
        if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout) {
        (record: String, rows: Iterator[Delta], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // expire: drop state; emit a retraction if the record was present
            val was = state.getOption.getOrElse(0L)
            state.remove()
            if (was > 0) Iterator(Delta(record, -1L)) else Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(0L)
            val next = prev + rows.map(_.weight).sum
            if (next == 0L) state.remove() else state.update(next)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            (prev > 0, next > 0) match {
              case (false, true) => Iterator(Delta(record, 1L))
              case (true, false) => Iterator(Delta(record, -1L))
              case _ => Iterator.empty
            }
          }
      }
  }

  /** Column-level adapter: any record DataFrame with a weight column →
    * CDC-style ±1 presence deltas keyed by the JSON-packed record (the
    * Tungsten-era analogue of the reference's msgpack packing,
    * topologynode.py:28-33). */
  def overFrame(df: DataFrame, ttlMs: Long = -1): Dataset[Delta] = {
    val spark = df.sparkSession
    import spark.implicits._
    val rec = to_json(struct(df.columns.filterNot(_ == "weight").map(col): _*))
    apply(df.select(rec.as("record"), col("weight").cast("long").as("weight")).as[Delta], ttlMs)
  }
}
