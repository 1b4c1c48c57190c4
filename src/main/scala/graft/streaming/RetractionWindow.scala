package graft.streaming

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Retraction-correct WINDOWED aggregation — the streams-half capability
  * Spark's built-in windowed aggregation cannot express (SURVEY §7.4's last
  * stretch item): the reference's windows consume a weighted Z-set delta
  * stream (topologynode.py:672-963 over ±w records), so a retraction (−w)
  * arriving inside the lateness horizon must CORRECT the window it falls
  * in, not be treated as a new insert. Spark's `window().agg(sum)` under
  * append mode sums whatever rows arrive — weights would need to ride the
  * values, and a finalized window can never re-emit.
  *
  * Implemented as flatMapGroupsWithState keyed by (key, window_end) — the
  * same state model as [[RetractionDistinct]]:
  *
  *  - state = (Σ weight·value, Σ weight) integrated per (key, window);
  *  - every micro-batch that CHANGES a window's totals re-emits the
  *    corrected (key, window_end_ms, sum_value, n) row — downstream sees
  *    an upsert stream exactly like the reference's `group_by_sum` output
  *    after integrate (latest row per key wins);
  *  - a window whose weights cancel to zero emits the zeroed row (the
  *    Z-set "absent" correction) and drops its state immediately;
  *  - the watermark horizon (EventTimeTimeout at window_end + delay)
  *    drops remaining state, so state size is bounded by the number of
  *    LIVE (key, window) pairs inside the horizon — never corpus-bounded.
  *
  * Scale note: state is hash-partitioned by (key, window_end) across
  * executors (RocksDB store in production); each micro-batch touches only
  * the windows present in the batch. 100 TB/day with a 1 h window and a
  * 10 min horizon holds ~7 window-epochs × |keys| state rows.
  */
object RetractionWindow {

  case class WinDelta(key: String, tsMs: Long, value: Long, weight: Long)
  case class WinSum(key: String, windowEndMs: Long, sumValue: Long, n: Long)

  /** Internal plumbing type (public only because Catalyst's generated
    * encoder code cannot touch private classes): WinDelta with the
    * watermark timestamp column materialized — the stateful operator
    * needs the event-time column typed alongside the data. */
  case class WinDeltaTs(key: String, tsMs: Long, value: Long,
      weight: Long, wmTs: java.sql.Timestamp)

  /** [[WinDeltaTs]] plus the exploded hopping window end. */
  case class WinDeltaW(key: String, tsMs: Long, value: Long,
      weight: Long, wmTs: java.sql.Timestamp, wend: Long)

  /** The shared (key, window) state machine: integrate (Σ w·v, Σ w),
    * re-emit on change, drop state on zero-cancel, event-time timeout at
    * window_end + delay. Generic over the grouped value type because the
    * watermark column must RIDE IN THE VALUES — projecting it away (e.g.
    * via mapValues) makes the event-time timeout unresolvable. */
  private def sumHandler[T](delayMs: Long, vw: T => (Long, Long)):
      ((String, Long), Iterator[T], GroupState[(Long, Long)]) => Iterator[WinSum] = {
    (kw, rows, state) =>
      val (key, winEnd) = kw
      if (state.hasTimedOut) {
        // horizon passed: the window can no longer change — drop state.
        // Corrections were emitted eagerly, so nothing re-emits here.
        state.remove()
        Iterator.empty
      } else {
        val (prevSum, prevN) = state.getOption.getOrElse((0L, 0L))
        var dSum = 0L
        var dN = 0L
        rows.foreach { d =>
          val (v, w) = vw(d)
          dSum += w * v
          dN += w
        }
        val (sum, n) = (prevSum + dSum, prevN + dN)
        if (sum == 0L && n == 0L) state.remove()
        else {
          state.update((sum, n))
          // the timeout must sit strictly past the current watermark;
          // a window already at the horizon edge still gets one tick
          state.setTimeoutTimestamp(
            math.max(winEnd + delayMs, state.getCurrentWatermarkMs() + 1))
        }
        if (dSum == 0L && dN == 0L) Iterator.empty
        else Iterator(WinSum(key, winEnd, sum, n))
      }
  }

  /** Tumbling windowed sum+count over a ±weighted delta stream.
    * `delayMs` is the lateness horizon: deltas (inserts OR retractions)
    * older than watermark − delay are dropped by the watermark, everything
    * inside corrects its window. */
  def tumblingSum(deltas: Dataset[WinDelta], sizeMs: Long, delayMs: Long): Dataset[WinSum] = {
    val spark = deltas.sparkSession
    import spark.implicits._
    deltas.toDF()
      .withColumn("wmTs", timestamp_millis(col("tsMs")))
      .withWatermark("wmTs", s"$delayMs milliseconds")
      .as[WinDeltaTs]
      .groupByKey(d => (d.key, (d.tsMs / sizeMs) * sizeMs + sizeMs))
      .flatMapGroupsWithState[(Long, Long), WinSum](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        sumHandler[WinDeltaTs](delayMs, d => (d.value, d.weight)))
  }

  /** Hopping form: a delta at t falls in size/hop overlapping windows, so
    * a retraction must correct ALL of them. The window-end assignment is
    * the same integer walk as the batch hopping oracle ((t div hop + j)·hop
    * for j = 1..size/hop), exploded BEFORE the group so each (key, window)
    * runs the identical state machine; per-delta state cost is the window
    * multiplicity, exactly as in the batch expansion. */
  def hoppingSum(deltas: Dataset[WinDelta], sizeMs: Long, hopMs: Long,
      delayMs: Long): Dataset[WinSum] = {
    require(sizeMs % hopMs == 0, s"sizeMs ($sizeMs) must be a multiple of hopMs ($hopMs)")
    val spark = deltas.sparkSession
    import spark.implicits._
    deltas.toDF()
      .withColumn("wmTs", timestamp_millis(col("tsMs")))
      .withWatermark("wmTs", s"$delayMs milliseconds")
      .withColumn("wend", explode(expr(
        s"sequence((tsMs div $hopMs + 1) * $hopMs, (tsMs div $hopMs) * $hopMs + $sizeMs, $hopMs)")))
      .as[WinDeltaW]
      .groupByKey(d => (d.key, d.wend))
      .flatMapGroupsWithState[(Long, Long), WinSum](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        sumHandler[WinDeltaW](delayMs, d => (d.value, d.weight)))
  }

  /** Cumulative (CUMULATE) form: a delta at t is assigned every window end
    * from its own advance-slot to its period's end — the same
    * explode(sequence(...)) walk as the batch [[graft.streams.Windows]]
    * cumulative operator — so a retraction corrects every expanding window
    * that had counted it. Session windows are the one form deliberately
    * NOT offered here: merging windows under retraction requires
    * re-splitting previously merged state, which needs the full event
    * multiset per session — integrate the deltas first, then window. */
  def cumulativeSum(deltas: Dataset[WinDelta], periodMs: Long, advanceMs: Long,
      delayMs: Long): Dataset[WinSum] = {
    require(periodMs % advanceMs == 0,
      s"periodMs ($periodMs) must be a multiple of advanceMs ($advanceMs)")
    val spark = deltas.sparkSession
    import spark.implicits._
    deltas.toDF()
      .withColumn("wmTs", timestamp_millis(col("tsMs")))
      .withWatermark("wmTs", s"$delayMs milliseconds")
      .withColumn("wend", explode(expr(
        s"""sequence(
           |  tsMs - pmod(tsMs, $advanceMs) + $advanceMs,
           |  tsMs - pmod(tsMs, $periodMs) + $periodMs,
           |  $advanceMs)""".stripMargin)))
      .as[WinDeltaW]
      .groupByKey(d => (d.key, d.wend))
      .flatMapGroupsWithState[(Long, Long), WinSum](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        sumHandler[WinDeltaW](delayMs, d => (d.value, d.weight)))
  }
}
