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
