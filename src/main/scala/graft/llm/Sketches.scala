package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketching for corpus profiling (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM'02 — the KMV /
  * bottom-k estimator): keep the k smallest distinct hash values of a
  * column; the k-th smallest u estimates |D| ≈ (k−1)·2^64/u.
  *
  * Why KMV and not HyperLogLog here: with a DETERMINISTIC hash (FNV-1a,
  * graft.llm.Hashing) the sketch is a pure function of the data — the k
  * minima, the k-th value, and the integer-division estimate are all
  * bit-reproducible, so q_sketch_kmv verifies the ESTIMATE exactly against
  * DuckDB, not "within ε". (Spark's own approx_count_distinct is HLL++ with
  * engine-private registers — accurate but unverifiable across engines.)
  *
  * Scale shape: the distinct() moves 8-byte hash rows with map-side
  * partial dedup, then the k minima are a TakeOrdered (per-partition top-k
  * + driver merge of k·P candidates — never a global sort). The sketch is
  * mergeable: the k smallest of a union is computable from each part's k
  * smallest, which is what makes it a profiling accumulator (one sketch
  * per shard/day, merged driver-side).
  */
object Sketches {

  private val Mask = (BigInt(1) << 64) - 1

  /** Exact integer KMV estimate from the k-th smallest unsigned hash:
    * floor((k−1)·2^64 / u). BigInt keeps the 2^64 numerator exact — the
    * same integer DuckDB computes in HUGEINT. */
  private[graft] def estimateFromKth(k: Int, kthHash: Long): Long =
    ((BigInt(k - 1) << 64) / (BigInt(kthHash) & Mask)).toLong

  /** One-row sketch summary of a string column: (n_exact, kth_hash,
    * est_distinct) for cross-checking; production use keeps just the k
    * minima per shard and merges. If the column has fewer than k distinct
    * values the estimate IS the exact count (the sketch is exact below k).
    * Hashes order UNSIGNED — the sign-bit flip makes Spark's signed sort
    * match DuckDB's natural HUGEINT order. */
  def kmvDistinct(df: DataFrame, column: String, k: Int = 64): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val hashes = df.select(col(column).cast("string"))
      .na.drop()
      .as[String]
      .mapPartitions(_.map(Hashing.hashString))
      .toDF("h")
      .distinct()
    val minima = hashes
      .withColumn("__flip", col("h").bitwiseXOR(lit(Long.MinValue)))
      .orderBy("__flip")
      .limit(k)
      .select("h")
      .as[Long]
      .collect()
      .sortBy(_ ^ Long.MinValue) // defensive: collect order is plan-dependent
    val nExact = hashes.count()
    val (kth, est) =
      if (minima.length < k) (minima.lastOption.getOrElse(0L), minima.length.toLong)
      else (minima.last, estimateFromKth(k, minima.last))
    Seq((nExact, kth, est)).toDF("n_exact", "kth_hash", "est_distinct")
  }
}
