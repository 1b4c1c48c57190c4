package graft.streams

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** group_by_agg with an arbitrary user fold (topologynode.py:434-487):
  * the reference re-folds each group's record list with a user
  * (agg_fun, agg_initial) pair. The Spark-native form is a typed
  * `Aggregator[IN, BUF, OUT]` — mergeable, spillable, executed inside the
  * hash aggregate, unlike a collect_list + driver fold (SURVEY §7.4 item 2).
  */
object Aggregators {

  /** A fold aggregator over (key, long-value) records. Mergeable folds
    * supply `combine`; genuinely non-commutative folds have no distributed
    * equivalent (the reference runs them single-threaded) and must be
    * restructured. */
  class LongFold(z: Long, fold: (Long, Long) => Long, combine: (Long, Long) => Long)
      extends Aggregator[(String, Long), Long, Long] {
    def zero: Long = z
    def reduce(b: Long, a: (String, Long)): Long = fold(b, a._2)
    def merge(b1: Long, b2: Long): Long = combine(b1, b2)
    def finish(b: Long): Long = b
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Sum-of-squares — the demo arbitrary fold (Σ v²), exercised by
    * q_zs_groupby_agg against a DuckDB oracle. */
  val sumOfSquares = new LongFold(0L, (b, a) => b + a * a, _ + _)

  /** group_by_agg: group `df` by `key` (cast to string), fold `value`
    * (cast to long) with the given Aggregator. */
  def groupByAggLong(df: DataFrame, key: String, value: String, agg: LongFold, as: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(key).cast("string"), col(value).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name(as))
      .toDF(key, as)
  }
}
