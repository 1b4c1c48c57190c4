package graft.streams

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

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

  /** Arbitrary-RECORD mergeable fold: the user fold sees the whole record
    * as a Row (the reference's unpacked tuple, topologynode.py:448-459),
    * the buffer is any encodable B. Runs inside the hash aggregate with
    * map-side partial folds — the distributed form of the reference's
    * per-group list re-fold, available whenever the fold is mergeable. */
  class RowFold[B](z: B, fold: (B, Row) => B, combine: (B, B) => B)(
      implicit bEnc: Encoder[B])
      extends Aggregator[Row, B, B] {
    def zero: B = z
    def reduce(b: B, r: Row): B = fold(b, r)
    def merge(b1: B, b2: B): B = combine(b1, b2)
    def finish(b: B): B = b
    def bufferEncoder: Encoder[B] = bEnc
    def outputEncoder: Encoder[B] = bEnc
  }

  /** group_by_agg over struct records with a mergeable fold: the Row the
    * fold sees has `recordCols` as its fields (a udaf with a Row input
    * encoder takes the fields as SEPARATE arguments — they reassemble into
    * the Row inside the aggregate). */
  def groupByAggRows[B](df: DataFrame, keys: Seq[String], recordCols: Seq[String],
      agg: RowFold[B], as: String): DataFrame = {
    val recSchema = StructType(recordCols.map(c =>
      StructField(c, df.schema(c).dataType, df.schema(c).nullable)))
    val f = udaf(agg, Encoders.row(recSchema))
    df.groupBy(keys.map(col): _*)
      .agg(f(recordCols.map(col): _*).as(as))
  }

  /** group_by_agg for NON-MERGEABLE (e.g. non-commutative) folds — the
    * reference's exact semantics: materialize each group's record list,
    * order it, fold left from `z` (topologynode.py:448-459; the reference
    * runs this single-threaded per group, and so does this — the
    * distribution is ACROSS groups). The group is collected with
    * collect_list, so a single group must fit in executor memory — the
    * same bound the reference's per-group list carries; genuinely huge
    * groups need a mergeable reformulation ([[RowFold]]).
    *
    * Records are sorted by the struct (orderCols ++ rest) ascending —
    * deterministic total order; make `orderCols` a per-group unique key
    * for a meaningful fold order. The reference's projection_fun of
    * (key, agg) is an ordinary .select on the result. */
  def groupByAggRefold[B](df: DataFrame, keys: Seq[String], orderCols: Seq[String],
      z: B, fold: (B, Row) => B, as: String, outType: DataType): DataFrame = {
    val rest = df.columns.filterNot(c => keys.contains(c) || orderCols.contains(c)).toSeq
    val recCols = orderCols ++ rest
    val grouped = df.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(recCols.map(col): _*))).as("__grp"))
    val outSchema = StructType(keys.map(grouped.schema(_)) :+ StructField(as, outType))
    val grpIdx = keys.length
    grouped.mapPartitions { rows =>
      rows.map { row =>
        val grp = row.getAs[scala.collection.Seq[Row]](grpIdx)
        var b = z
        val it = grp.iterator
        while (it.hasNext) b = fold(b, it.next())
        Row.fromSeq((0 until grpIdx).map(row.get) :+ b)
      }
    }(Encoders.row(outSchema))
  }
}
