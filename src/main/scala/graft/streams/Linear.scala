package graft.streams

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The linear/temporal operators of the streams half — integrate,
  * differentiate, delay, expire, trigger (topologynode.py:63-112, 573-666).
  *
  * In batch mode "stream time" is an explicit order column; the circuit's
  * z⁻¹/∫/∂ become window functions over that order. In streaming mode the
  * same semantics come from Structured Streaming state (graft.streaming).
  *
  * Scale note: integrate/differentiate/delay shuffle once by key and sort
  * within partitions — the minimal plan for an ordered per-key scan. expire
  * computes the global watermark as a 1-row aggregate broadcast back, never
  * a single-partition window.
  */
object Linear {

  /** _integrate — running sum of the stream: delta → state
    * (topologynode.py:63-78). */
  def integrate(df: DataFrame, keys: Seq[String], order: Column, value: Column, as: String): DataFrame =
    df.withColumn(as,
      sum(value).over(
        Window.partitionBy(keys.map(col): _*).orderBy(order)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** _differentiate — state → delta: value minus previous value
    * (topologynode.py:80-95). DBSP semantics: the z⁻¹ initial state is the
    * group zero, so the FIRST row's delta is its value (not null) —
    * differentiate ∘ integrate round-trips to the input. */
  def differentiate(df: DataFrame, keys: Seq[String], order: Column, value: Column, as: String,
      zero: Column = lit(0)): DataFrame =
    df.withColumn(as,
      value - coalesce(
        lag(value, 1).over(Window.partitionBy(keys.map(col): _*).orderBy(order)), zero))

  /** _delay (z⁻¹) — previous step's value (topologynode.py:97-112). z⁻¹ is
    * type-generic, so the first-step value defaults to NULL; numeric
    * pipelines wanting the DBSP group-zero pass `zero = lit(0)` (as
    * differentiate does internally). */
  def delay(df: DataFrame, keys: Seq[String], order: Column, value: Column, as: String,
      zero: Column = lit(null)): DataFrame =
    df.withColumn(as,
      coalesce(
        lag(value, 1).over(Window.partitionBy(keys.map(col): _*).orderBy(order)), zero))

  /** expire — watermark-based state expiry (topologynode.py:573-648): drop
    * records whose timestamp is older than max(event time) − delay. The
    * batch form of `withWatermark` + state TTL; the retraction emission of
    * the streaming form lives in graft.streaming.RetractionDistinct. */
  def expire(df: DataFrame, tsMsCol: Column, delayMs: Long): DataFrame = {
    val wm = df.agg(max(tsMsCol).as("__maxts"))
    df.crossJoin(broadcast(wm))
      .filter(tsMsCol >= col("__maxts") - delayMs)
      .drop("__maxts")
  }

  /** trigger — emit a windowed row only once the watermark passed its
    * window end (topologynode.py:654-666): batch form of append-mode window
    * finalization. `windowed` carries `endMsCol`; `source` supplies the
    * watermark (max event time − 0). */
  def trigger(windowed: DataFrame, endMsCol: Column, source: DataFrame, sourceTsMs: Column): DataFrame = {
    val wm = source.agg(max(sourceTsMs).as("__wm"))
    windowed.crossJoin(broadcast(wm))
      .filter(endMsCol <= col("__wm"))
      .drop("__wm")
  }
}
