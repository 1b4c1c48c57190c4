package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

/** Streaming admission control: the ingestion-time twin of the batch
  * `Sampling.capPerDomain`. A crawler feed is dominated by a few hot hosts;
  * capping per-domain admission AT INGESTION keeps the hot tail from ever
  * landing, instead of paying to store it and trimming later.
  */
object StreamingCaps {

  /** Admit at most `maxPerDomain` rows per `domainCol` value within each
    * watermark horizon. State per domain is ONE long (the admitted count),
    * keyed and hash-partitioned by domain across executors, evicted by
    * event-time timeout once the watermark passes the domain's last
    * arrival + `delayMs` — so state is bounded by |active domains in
    * horizon|, never feed size, and an idle domain's budget resets after
    * eviction (the cap is per-horizon, which is the streaming-meaningful
    * reading of "at most k per domain").
    *
    * Within a micro-batch, admission order is the batch operator's
    * deterministic (splitmix64(id), id) order — a replayed batch admits
    * the same rows. ACROSS batches it is arrival order, which is inherent
    * to streaming (same contract note as `StreamingDedup.firstSeen`: the
    * batch `capPerDomain` pass over the landed corpus is the exact
    * backstop). Rows whose id is null / not long-castable are dropped,
    * matching the batch operator.
    *
    * `df` must be streaming with event-time column `tsCol`. */
  def domainCapFirstSeen(df: DataFrame, idCol: String, domainCol: String,
      tsCol: String, delayMs: Long, maxPerDomain: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val in = df
      .withColumn("__id_long", expr(s"try_cast(`$idCol` as bigint)"))
      .filter(col("__id_long").isNotNull)
      // a null event time cannot hold state within a horizon; drop it like
      // an unrankable id rather than NPE mid-query
      .filter(col(tsCol).isNotNull)
      .withWatermark(tsCol, s"$delayMs milliseconds")
    val schema = in.schema
    val dIdx = schema.fieldIndex(domainCol)
    val idIdx = schema.fieldIndex("__id_long")
    val tsIdx = schema.fieldIndex(tsCol)
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(schema)
    // a null domain is its own group (matching the batch operator) — never
    // String.valueOf, which would pool null with the literal string "null"
    in.groupByKey { row =>
        val d = row.get(dIdx)
        if (d == null) null else d.toString
      }
      .flatMapGroupsWithState[Long, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows: Iterator[Row], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var admitted = state.getOption.getOrElse(0L)
            // the batch operator's total order, applied within the batch
            val sorted = rows.toArray.sortBy { r =>
              val id = r.getLong(idIdx)
              (graft.llm.Hashing.splitmix64(id), id)
            }
            val out = Seq.newBuilder[Row]
            var maxTs = Long.MinValue
            var i = 0
            while (i < sorted.length) {
              val t = sorted(i).getTimestamp(tsIdx).getTime
              if (t > maxTs) maxTs = t
              if (admitted < maxPerDomain) {
                out += sorted(i)
                admitted += 1
              }
              i += 1
            }
            state.update(admitted)
            // evict once the watermark passes last arrival + horizon; the
            // timeout must sit strictly beyond the current watermark
            state.setTimeoutTimestamp(
              math.max(maxTs + delayMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
      .drop("__id_long")
  }
}
