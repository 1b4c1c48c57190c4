package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Bloom-filter membership for corpus-scale blocklists (Bloom, CACM 1970).
  *
  * The 100 TB use case: probing every document against a bounded reference
  * set — a URL blocklist, a benchmark-contamination digest, an
  * already-ingested-id ledger — without shuffling the corpus. The filter is
  * built in ONE typed aggregation (per-partition bitset OR, merged as
  * map-side partials; the driver ever sees only `bits/8` bytes), then ships
  * to the probe side as a task broadcast and the probe is a pure map stage.
  * A Bloom pre-filter in front of an exact semi-join is the standard way to
  * keep the join's shuffle proportional to the HIT count instead of the
  * corpus size — `Dedup.decontaminate` broadcasts its exact shingle set
  * today; this is the constant-memory variant for reference sets too big
  * for an exact broadcast (the filter is 2^b bits no matter how many items
  * went in).
  *
  * Determinism: bit positions are `mix64(fnv1a(x), i) mod bits` — the same
  * public FNV-1a/splitmix64 kernels as every other signature here
  * (graft.llm.Hashing), no RNG, so the filter (and its false positives!)
  * are a pure function of the insert set and q_bloom_probe replays
  * membership — including the false-positive rows — exactly in DuckDB.
  *
  * `bits` must be a power of two so `mod bits` is a mask; false-positive
  * rate ≈ (1 − e^(−kn/bits))^k — size for the insert cardinality you
  * expect, e.g. bits = 16n, k = 7 gives ~1%.
  */
object Bloom {

  /** The k bit positions of one value. `bits` is a power of two; the
    * unsigned mask keeps the position identical to DuckDB's
    * `mix64(fnv1a(x), i) % bits` over the [0, 2^64) hugeint range. */
  private[graft] def positions(value: String, bits: Int, k: Int): Array[Int] =
    positionsOfHash(Hashing.hashString(value), bits, k)

  /** Positions for a value that is ALREADY a 64-bit hash (shingle kernels
    * emit longs; re-stringing them would be a different filter). */
  private[graft] def positionsOfHash(h: Long, bits: Int, k: Int): Array[Int] =
    Array.tabulate(k)(i => (Hashing.mix(h, i) & (bits - 1)).toInt)

  /** Membership of a pre-hashed value against a built filter. */
  private[graft] def containsHash(filter: Array[Long], h: Long, k: Int): Boolean = {
    val bits = filter.length * 64
    val pos = positionsOfHash(h, bits, k)
    var ok = true
    var i = 0
    while (ok && i < pos.length) {
      ok = (filter(pos(i) >>> 6) & (1L << (pos(i) & 63))) != 0L
      i += 1
    }
    ok
  }

  /** [[build]] over a LONG hash column (e.g. shingle hashes): same
    * per-partition OR / driver fold, positions from the hash directly. */
  def buildFromHashes(df: DataFrame, column: String, bits: Int = 1 << 20,
      k: Int = 3): Array[Long] = {
    require(bits >= 64 && (bits & (bits - 1)) == 0, "bits must be a power of two >= 64")
    require(k >= 1 && k <= 16, "k in [1,16]")
    val spark = df.sparkSession
    import spark.implicits._
    val values = df.select(col(column).cast("long")).na.drop().as[Long]
    val parts = values.mapPartitions { it =>
      val buf = new Array[Long](bits / 64)
      var any = false
      while (it.hasNext) {
        val pos = positionsOfHash(it.next(), bits, k)
        var i = 0
        while (i < pos.length) { buf(pos(i) >>> 6) |= 1L << (pos(i) & 63); i += 1 }
        any = true
      }
      if (any) Iterator.single(buf) else Iterator.empty
    }(Encoders.kryo[Array[Long]])
    val out = new Array[Long](bits / 64)
    parts.collect().foreach { b =>
      var i = 0
      while (i < out.length) { out(i) |= b(i); i += 1 }
    }
    out
  }

  /** Build the filter from a string column: one bitset per input partition
    * built locally (a map stage over the values — the only pass over the
    * data), then OR-reduced; the driver ever sees `bits/8` bytes per
    * partial (that is the SKETCH, not the data; 2^20 bits = 128 KiB).
    * Null values are skipped. */
  def build(df: DataFrame, column: String, bits: Int = 1 << 16, k: Int = 3): Array[Long] = {
    require(bits >= 64 && (bits & (bits - 1)) == 0, "bits must be a power of two >= 64")
    require(k >= 1 && k <= 16, "k in [1,16]")
    val spark = df.sparkSession
    import spark.implicits._
    val values = df.select(col(column).cast("string")).na.drop().as[String]
    val parts = values.mapPartitions { it =>
      val buf = new Array[Long](bits / 64)
      var any = false
      while (it.hasNext) {
        val pos = positions(it.next(), bits, k)
        var i = 0
        while (i < pos.length) { buf(pos(i) >>> 6) |= 1L << (pos(i) & 63); i += 1 }
        any = true
      }
      if (any) Iterator.single(buf) else Iterator.empty
    }(Encoders.kryo[Array[Long]])
    // ONE job: collect the ≤ #partitions partials (bits/8 bytes each) and
    // OR-fold driver-side — the same merge shape Dataset.reduce would use,
    // without its throw-on-empty hazard or a second isEmpty scan. At
    // extreme partition counts swap for rdd.treeAggregate; at 100k
    // partitions × 2^16 bits the partials are still only ~800 MB and in
    // practice the filter is built from the (bounded) REFERENCE set, not
    // the corpus.
    val out = new Array[Long](bits / 64)
    parts.collect().foreach { b =>
      var i = 0
      while (i < out.length) { out(i) |= b(i); i += 1 }
    }
    out
  }

  /** Probe `column` against a built filter: appends `maybe_member` — false
    * is DEFINITE absence (no false negatives, LlmSpec-asserted), true means
    * "in the insert set or a replayable false positive". Pure map stage;
    * the filter rides the task closure (a few KiB–MiB), the corpus never
    * shuffles. Null values probe to null. */
  def probe(df: DataFrame, idCol: String, column: String,
      filter: Array[Long], k: Int = 3): DataFrame = {
    val bits = filter.length * 64
    require(bits > 0 && (bits & (bits - 1)) == 0, "filter length must be a power of two")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(column).cast("string"))
      .as[(Long, Option[String])]
      .mapPartitions { it =>
        it.map { case (id, v) =>
          val hit = v.map { s =>
            val pos = positions(s, bits, k)
            var ok = true
            var i = 0
            while (ok && i < pos.length) {
              ok = (filter(pos(i) >>> 6) & (1L << (pos(i) & 63))) != 0L
              i += 1
            }
            ok
          }
          (id, hit)
        }
      }
      .toDF(idCol, "maybe_member")
  }
}
