package graft.streams

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Debezium CDC adapters (topologynode.py:1090-1103, 1148-1167):
  * op c/u → +1 on `after`, op d → −1 on `before` — CDC events become signed
  * Z-set deltas; on the way out, signed deltas become create/delete
  * envelopes, i.e. the engine emits retractions.
  */
object Debezium {

  /** from_debezium — rows carry (op, before, after) columns; the payload
    * struct column that survives is `record`. */
  def fromDebezium(df: DataFrame, op: Column, before: Column, after: Column): DataFrame =
    df.select(
      when(op === "d", before).otherwise(after).as("record"),
      when(op === "d", lit(-1L)).otherwise(lit(1L)).as(ZSet.W))
      .select(col("record.*"), col(ZSet.W))

  /** to_debezium — consolidated delta → CDC envelope rows: weight>0 emits a
    * create ('c'), weight<0 a delete ('d'); |weight| kept as multiplicity
    * (the reference replicates instead — same information, no fanout). */
  def toDebezium(zset: DataFrame): DataFrame =
    envelope(ZSet.consolidate(zset))

  /** Streaming to_debezium: the same envelope mapping WITHOUT the batch
    * consolidate (a blocking groupBy is not appendable mid-stream). Feed it
    * an already-consolidated delta stream — RetractionDistinct's ±1 output
    * is exactly that — and the full reference lifecycle
    * (topologynode.py:1148-1167 via streams.py's checkpointing runner)
    * composes as readStream → RetractionDistinct → toDebeziumStream →
    * Runner.demux, restartable from the checkpoint (StreamingSpec). */
  def toDebeziumStream(deltas: DataFrame): DataFrame = envelope(deltas)

  private def envelope(d: DataFrame): DataFrame =
    d.withColumn("op", when(col(ZSet.W) > 0, lit("c")).otherwise(lit("d")))
      .withColumn("multiplicity", abs(col(ZSet.W)))
      .drop(ZSet.W)
}
