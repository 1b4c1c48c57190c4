package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton / Z-order interleaving — the data-LAYOUT lever for 100 TB
  * scans. A table range-partitioned and sorted by a single key prunes
  * scans on that key only; sorting by the bit-interleave of TWO keys
  * gives every file/row-group a tight min-max envelope in BOTH
  * dimensions, so a 2-D box predicate (customer range × date range,
  * domain × crawl-week) skips most of the corpus at the parquet-footer
  * level instead of reading it (Morton 1966; the technique behind
  * Delta/Iceberg Z-ORDER clustering — public literature, implemented
  * from the bit definition).
  *
  * Built from codegen'd bit intrinsics only (shiftrightunsigned / and /
  * shiftleft / or — no UDF, stays inside whole-stage codegen, ANSI-safe:
  * every term is a masked single bit, nothing can overflow). Cost is a
  * per-row map; the payoff is at WRITE time:
  * `df.repartitionByRange(n, zorder(x, y, b)).sortWithinPartitions(...)`
  * clusters both dimensions at once.
  */
object ZOrder {

  /** Interleave the low `bits` bits of non-negative `x` and `y`:
    * result bit 2i = x bit i, bit 2i+1 = y bit i. `bits` ≤ 31 keeps the
    * result positive in a long. Higher input bits are ignored (callers
    * bound the domain first — pmod, bucketing, or epoch-day division). */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftrightunsigned(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    // the terms occupy disjoint bits, so + and | coincide; | states intent
    terms.reduce(_ bitwiseOR _)
  }
}
