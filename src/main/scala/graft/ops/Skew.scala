package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation.
  *
  * Scope: algebraic aggregates (sum/count) already collapse per-key state
  * in the MAP-SIDE partial HashAggregate, so plain groupBy handles even a
  * 90%-hot key; salting matters when the partial state does NOT collapse —
  * composite keys with high per-key cardinality, or aggregation pipelines
  * whose first phase materializes per-key rows. The two-phase shape here is
  * that pattern, verified equivalent to the unsalted form through the
  * correctness gate.
  *
  * The salt MUST be deterministic per row content: a position-derived salt
  * (monotonically_increasing_id, rand) changes row→bucket assignment when a
  * lost map task is recomputed while other reducers keep attempt-1 output —
  * the SPARK-23207 class of silent double-count/loss. Row-content hashing
  * is retry-stable; byte-identical duplicate rows sharing a bucket is fine
  * precisely because partial aggregation collapses them map-side first.
  */
object Skew {

  /** Σ value per key, salted. Equivalent to
    * df.groupBy(keys).agg(sum(value)) under any data distribution. */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column, as: String,
      saltFactor: Int = 16): DataFrame = {
    // deterministic (retry-stable) salt from the full row content
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(saltFactor)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(value).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(as))
  }

  /** count per key, salted. */
  def saltedCount(df: DataFrame, keys: Seq[String], as: String,
      saltFactor: Int = 16): DataFrame =
    saltedSum(df.withColumn("__one", lit(1L)), keys, col("__one"), as, saltFactor)
}
