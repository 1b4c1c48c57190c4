package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation.
  *
  * A groupBy on a hot key (one user generating 10% of a 100 TB stream)
  * sends that key's entire volume to one reducer. Salting splits each key
  * into `saltFactor` sub-keys for a map-side-heavy partial aggregate, then
  * de-salts with a second (tiny) aggregation. Algebra is unchanged for any
  * commutative monoid aggregate.
  *
  * AQE's skew-join handling covers JOIN skew at runtime; aggregation skew
  * on a pathological key distribution is what this addresses. The salt
  * hashes the row's physical position, so even byte-identical duplicates
  * of a hot key spread across buckets; the final aggregate is invariant
  * to the placement.
  */
object Skew {

  /** Σ value per key, salted. Equivalent to
    * df.groupBy(keys).agg(sum(value)) under any data distribution. */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column, as: String,
      saltFactor: Int = 16): DataFrame = {
    // salt must spread IDENTICAL duplicate rows of a hot key too (the most
    // common skew shape), so it mixes in the row's physical position —
    // placement varies run to run, but the aggregate is placement-invariant
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
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
