package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, in their scalable formulations
  * (the brief's "custom operators" tier — composed from existing ops, no
  * custom physical plan needed).
  *
  * Both avoid the naive shapes that die at 100 TB:
  *  - as-of via join-then-argmax explodes |left| × |right-per-key| rows
  *    through a shuffle before discarding all but one per left row;
  *  - range join via theta join is a per-key cross product evaluated by
  *    BroadcastNestedLoopJoin.
  */
object Temporal {

  /** As-of join (backward, inclusive): each left row picks the LATEST right
    * row with rightTime <= leftTime within the same key group.
    *
    * Shape: tag both sides, UNION, one window pass — `last(right payload,
    * ignoreNulls)` over (key) ordered by (time, right-first) carries the
    * most recent right payload forward onto every left row. ONE shuffle on
    * the key, one sort within partitions — the sort-merge formulation every
    * large-scale engine uses for as-of. Right rows sort BEFORE left rows at
    * equal time, making the match inclusive. Among right rows with equal
    * (key, time) the larger payload struct wins (total, deterministic).
    *
    * Right payload columns come back prefixed with `rightPrefix`; left rows
    * with no match carry nulls (left-outer semantics).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, rightPrefix: String = "r_"): DataFrame = {
    val lp = left.columns.filterNot(c => keys.contains(c) || c == timeCol)
    val rp = right.columns.filterNot(c => keys.contains(c) || c == timeCol)
    val lpType = left.select(struct(lp.map(col): _*)).schema.head.dataType
    val rpType = right.select(struct(rp.map(col): _*)).schema.head.dataType
    val lTag = left.select(
      keys.map(col) ++ Seq(
        col(timeCol),
        lit(0).as("__r"),
        struct(lp.map(col): _*).as("__lp"),
        lit(null).cast(rpType).as("__rp")): _*)
    val rTag = right.select(
      keys.map(col) ++ Seq(
        col(timeCol),
        lit(1).as("__r"),
        lit(null).cast(lpType).as("__lp"),
        struct(rp.map(col): _*).as("__rp")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__r").desc, col("__rp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTag.unionByName(rTag)
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__r") === 0)
      .select(
        keys.map(col) ++ Seq(col(timeCol)) ++
          lp.map(c => col(s"__lp.$c").as(c)) ++
          rp.map(c => col(s"__m.$c").as(s"$rightPrefix$c")): _*)
  }

  /** Interpolation join — the as-of family's two-sided form: each left row
    * gets the linear interpolation of `valueCol` between its BRACKETING
    * right rows (latest at-or-before and earliest at-or-after, per key).
    * The standard time-series alignment for sensor/metric feeds sampled on
    * their own clocks; the one-sided [[asofJoin]] carries the last value
    * forward, this reconstructs the value AT the query instant.
    *
    * Output: left columns + (`outCol` = v0 + (v1 − v0)·(t − t0)/(t1 − t0)
    * as double). An exact hit (t = t0 = t1: both brackets resolve to the
    * same right row) returns that row's value with no division; left rows
    * OUTSIDE the right side's covered range (missing either bracket) get
    * null — interior interpolation only, extrapolation is the caller's
    * policy. `timeCol` must be NUMERIC on both sides (epoch millis):
    * the forward bracket is the backward as-of on negated time, and
    * negation needs arithmetic.
    *
    * Like DuckDB's ASOF at ties, the bracket choice among right rows with
    * equal (key, time) is only deterministic given a tie-free right side —
    * pre-aggregate right to one value per (key, time) (as the oracle
    * fixture does) when duplicates are possible.
    *
    * Shape: two [[asofJoin]] passes = two key-shuffled window passes over
    * slim (key, t, v) right rows — never a per-key cross product, same
    * sort-merge posture as the one-sided form. */
  def interpolateJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, valueCol: String, outCol: String = "interp"): DataFrame = {
    val r2 = right.select(
      keys.map(col) :+
        col(timeCol).cast("double").as(timeCol) :+
        col(timeCol).cast("double").as("__rt") :+
        col(valueCol).cast("double").as("__rv"): _*)
    val lCast = left.withColumn(timeCol, col(timeCol).cast("double"))
    val back = asofJoin(lCast, r2, keys, timeCol, "__b_")
    val ln = back.withColumn("__negt", -col(timeCol))
    val rn = r2.select(
      keys.map(col) :+ (-col(timeCol)).as("__negt") :+
        col("__rt") :+ col("__rv"): _*)
    asofJoin(ln, rn, keys, "__negt", "__f_")
      .drop("__negt")
      .withColumn(outCol,
        when(col("__b___rt") === col("__f___rt"), col("__b___rv"))
          .otherwise(col("__b___rv") + (col("__f___rv") - col("__b___rv")) *
            (col(timeCol) - col("__b___rt")) / (col("__f___rt") - col("__b___rt"))))
      .drop("__b___rt", "__b___rv", "__f___rt", "__f___rv")
  }

  /** Range join: all (left, right) pairs within the same key group whose
    * time difference is at most `delta` (inclusive, same units as the time
    * columns — typically epoch millis).
    *
    * Shape: bucket time by `delta`; the RIGHT side is replicated into its
    * bucket and both neighbors, the join runs on (key, bucket) equality,
    * and the exact |Δt| <= delta predicate filters candidates. Each true
    * pair matches exactly one replica, so no dedup pass is needed. The
    * shuffle is keyed by (key, bucket) — candidate volume is bounded by
    * bucket co-membership, never a per-key cross product.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, delta: Long, rightPrefix: String = "r_"): DataFrame = {
    require(delta > 0, "delta must be positive")
    val rp = right.columns.filterNot(keys.contains)
    val l = left.withColumn("__bk", floor(col(timeCol) / delta))
    val r = right
      .select(keys.map(col) ++ rp.map(c => col(c).as(s"$rightPrefix$c")): _*)
      .withColumn("__bk",
        explode(array(
          floor(col(s"$rightPrefix$timeCol") / delta) - 1,
          floor(col(s"$rightPrefix$timeCol") / delta),
          floor(col(s"$rightPrefix$timeCol") / delta) + 1)))
    l.join(r, keys :+ "__bk")
      .filter(abs(col(timeCol) - col(s"$rightPrefix$timeCol")) <= delta)
      .drop("__bk")
  }
}
