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

  // ---- HyperLogLog (Flajolet et al., AofA'07) ----
  //
  // The OTHER mergeable cardinality sketch: m = 2^p registers, register j =
  // max over items in bucket j of (leading-zero run of the hash suffix + 1).
  // Kept alongside KMV because the two have different merge economics: a
  // KMV sketch is k 8-byte hashes (512 B at k=64) and merges by re-sorting;
  // an HLL sketch is m 6-bit registers (fixed 2^p bytes here, one byte per
  // register) and merges by element-wise max — the standard choice when
  // millions of per-shard sketches must be combined (one per file/day/
  // domain). Same determinism argument as KMV: FNV-1a hashing makes the
  // registers a pure function of the data, so q_sketch_hll verifies every
  // register and q_sketch_hll_est the integer-scaled estimate — not
  // "within ε" (Spark's approx_count_distinct is HLL++ with engine-private
  // registers; unverifiable across engines).

  /** Non-empty HLL registers of a string column as rows (bucket, rho):
    * bucket = top p bits of the unsigned FNV-1a hash, rho = leading-zero
    * count of the remaining 64−p bits + 1 (all-zero suffix → 64−p+1), max
    * per bucket. Scale shape: a codegen-friendly per-row map then ONE
    * groupBy on an int key ≤ 2^p with map-side partial max — the shuffle
    * carries at most m rows per task regardless of input size. Registers
    * merge across sketches by the same max (LlmSpec asserts the merge law).
    */
  /** The per-value HLL observation: (bucket, rho). Shared by the batch
    * registers, the estimate, and the streaming windowed form. */
  private[graft] def bucketRho(s: CharSequence, p: Int): (Int, Int) = {
    val h = Hashing.hashString(s)
    val bucket = (h >>> (64 - p)).toInt
    val w = h << p
    val rho = if (w == 0L) 64 - p + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1
    (bucket, rho)
  }

  def hllRegisters(df: DataFrame, column: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, "p in [4,16]")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(column).cast("string"))
      .na.drop()
      .as[String]
      .mapPartitions(_.map(bucketRho(_, p)))
      .toDF("bucket", "rho")
      .groupBy("bucket").agg(max("rho").as("rho"))
      .orderBy("bucket")
  }

  /** The exact-integer estimate chain from a register map (missing buckets
    * = 0): (n_zero, est_raw, est). Factored out so streaming register
    * snapshots evaluate through the IDENTICAL arithmetic as [[hllDistinct]]. */
  private[graft] def estimateFromRegisters(regs: Map[Int, Int], p: Int): (Long, Long, Long) = {
    val m = 1 << p
    val nZero = m - regs.size
    val s = (0 until m).foldLeft(BigInt(0)) { (acc, j) =>
      acc + (BigInt(1) << (64 - regs.getOrElse(j, 0)))
    }
    // Flajolet et al. '07 §4: the closed form α ≈ 0.7213/(1+1.079/m) is the
    // m→∞ asymptote, only accurate for m ≥ 128; the paper gives exact
    // constants for the three small register counts
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val alphaE9 = math.floor(alpha * 1e9).toLong
    val estRaw = ((BigInt(alphaE9) * m * m << 64) / s / 1000000000L).toLong
    val est =
      if (estRaw <= 5L * m / 2 && nZero > 0)
        math.floor(m * math.log(m.toDouble / nZero)).toLong
      else estRaw
    (nZero.toLong, estRaw, est)
  }

  /** One-row HLL estimate: (n_exact, n_zero, est_raw, est). The raw
    * estimate is computed in EXACT integer arithmetic so DuckDB reproduces
    * it bit-for-bit: with R_j the register values (0 for empty buckets),
    * the harmonic-mean denominator Σ_j 2^−R_j is scaled by 2^64 to the
    * integer S = Σ_j 2^(64−R_j), and
    * est_raw = ⌊α_e9 · m² · 2^64 / S / 10^9⌋ where α_e9 = ⌊α_m · 10^9⌋
    * (exact BigInt ÷, same HUGEINT chain in the oracle). The small-range
    * branch (est_raw ≤ 5m/2 and empty buckets exist) switches to linear
    * counting ⌊m · ln(m/V)⌋ — ln is the one double in the pipeline, same
    * replay posture as q_text_lm_score. Large-range correction (E > 2^64/30)
    * is unreachable at any real corpus size and omitted. */
  def hllDistinct(df: DataFrame, column: String, p: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val regs = hllRegisters(df, column, p).as[(Int, Int)].collect().toMap // ≤ m rows
    val nExact = df.select(col(column).cast("string")).na.drop().distinct().count()
    val (nZero, estRaw, est) = estimateFromRegisters(regs, p)
    Seq((nExact, nZero, estRaw, est)).toDF("n_exact", "n_zero", "est_raw", "est")
  }

  // ---- Count-Min Sketch (Cormode & Muthukrishnan, J. Algorithms 2005) ----
  //
  // The FREQUENCY member of the sketch family (KMV/HLL count distincts,
  // Bloom answers membership, CMS answers "how often"): depth×width
  // counters, counter(j, mix_j(h) mod width) += 1 per observation, point
  // estimate = min over the depth rows — an OVERESTIMATE, never an under
  // (every occurrence lands in all d counters; collisions only add). That
  // one-sidedness is the work-horse property: a CMS pre-filter loses no
  // truly-frequent value, so exact verification of the (rare) survivors
  // yields an EXACT heavy-hitter set — the same filter-then-verify shape
  // as [[graft.llm.Dedup.decontaminateBloom]].
  //
  // Same determinism argument as KMV/HLL: FNV-1a + splitmix row hashes make
  // every counter a pure function of the data, so q_sketch_cms verifies the
  // full counter table against DuckDB bit-for-bit.

  /** Row-j counter position of a pre-hashed value: mix64(h, j) unsigned-mod
    * width — matches the oracle's `mix64(h, j) % w` over [0, 2^64). */
  private[graft] def cmsPos(h: Long, j: Int, width: Int): Int =
    java.lang.Long.remainderUnsigned(Hashing.mix(h, j), width.toLong).toInt

  /** Non-empty CMS counters of a string column as rows (j, pos, cnt).
    * Scale shape: a per-row flatMap of `depth` slim (int, int) pairs, then
    * ONE groupBy whose key space is ≤ depth·width — map-side partial sums
    * collapse each task's contribution to at most depth·width rows
    * regardless of input size (the sketch IS the bound, like
    * [[hllRegisters]]). Counters merge across sketches by element-wise SUM
    * (LlmSpec asserts the merge law), the property that makes CMS the
    * per-shard frequency accumulator at 100 TB. */
  def cmsRegisters(df: DataFrame, column: String, depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 16, "depth in [1,16]")
    require(width >= 2, "width >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(column).cast("string"))
      .na.drop()
      .as[String]
      .mapPartitions { it =>
        it.flatMap { s =>
          val h = Hashing.hashString(s)
          (0 until depth).iterator.map(j => (j, cmsPos(h, j, width)))
        }
      }
      .toDF("j", "pos")
      .groupBy("j", "pos").agg(count(lit(1)).as("cnt"))
      .orderBy("j", "pos")
  }

  /** The collected counter table as a dense depth×width array — ≤
    * depth·width rows land on the driver (the sketch's fixed size, NOT
    * data-bounded; the [[kmvDistinct]]/codebook posture). */
  private[graft] def collectCms(registers: DataFrame, depth: Int,
      width: Int): Array[Array[Long]] = {
    val table = Array.fill(depth)(new Array[Long](width))
    registers.select(col("j").cast("int"), col("pos").cast("int"),
        col("cnt").cast("long"))
      .collect()
      .foreach(r => table(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    table
  }

  /** CMS point estimate of one pre-hashed value: min over the depth rows. */
  private[graft] def cmsEstimate(table: Array[Array[Long]], h: Long): Long = {
    val width = table(0).length
    var est = Long.MaxValue
    var j = 0
    while (j < table.length) {
      val c = table(j)(cmsPos(h, j, width))
      if (c < est) est = c
      j += 1
    }
    est
  }

  /** EXACT heavy hitters — every distinct value of `column` whose exact
    * occurrence count is ≥ `threshold`, as (value, cnt) — found WITHOUT
    * shuffling the full value cardinality:
    *
    *  1. one pass builds the CMS ([[cmsRegisters]] — shuffle ≤ depth·width
    *     rows);
    *  2. a map-side probe of the broadcast table keeps only occurrences
    *     whose CMS estimate clears the threshold — no false negatives (CMS
    *     only overestimates), so every true heavy hitter survives;
    *  3. exact count of the survivors (map-side combine makes the shuffle
    *     ≤ survivors × tasks rows) and the final ≥-threshold filter kills
    *     the CMS false positives.
    *
    * The full-cardinality groupBy this replaces is the thing that dies at
    * 100 TB on a heavy-tailed token column (billions of distinct keys,
    * shuffle ∝ corpus); here the shuffle is ∝ occurrences OF CANDIDATES,
    * tunable by width. The oracle (q_heavy_hitters) is the plain exact
    * GROUP BY HAVING — the sketch path must reproduce it row-for-row. */
  def heavyHitters(df: DataFrame, column: String, threshold: Long,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(threshold >= 1, "threshold >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val values = df.select(col(column).cast("string")).na.drop().as[String]
    val table = collectCms(cmsRegisters(values.toDF(column), column, depth, width),
      depth, width)
    val bc = spark.sparkContext.broadcast(table)
    values
      .mapPartitions { it =>
        val t = bc.value
        it.filter(s => cmsEstimate(t, Hashing.hashString(s)) >= threshold)
      }
      .groupBy(col("value"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }

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
