package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Envelope

/** Table utilities — capability parity with the reference's `AddOns` mixin
  * (kafi/addons.py:19-219) plus the watermark/lag admin reads
  * (kafi/storage.py:245-255, kafi/fs/fs_admin.py:156-183).
  *
  * All operators are single-pass aggregations; none sorts globally and none
  * materializes on the driver.
  */
object AddOns {

  /** compact — per-key last-value-wins, null value = tombstone delete
    * (kafi/addons.py:19-41).
    *
    * Implemented as `max_by(struct(*), offset)` — ONE hash aggregation with
    * map-side partial combine, not a window sort: at 100 TB this shuffles
    * each key once and never sorts. (A row_number()-over-window formulation
    * would sort every partition — deliberately avoided.)
    */
  def compact(env: DataFrame): DataFrame = {
    env
      .groupBy("key")
      .agg(expr(s"max_by(struct(${env.columns.mkString(", ")}), offset)").as("__last"))
      .select(col("__last.*"))
      .filter(col("value").isNotNull)
  }

  /** compact_to (kafi/addons.py:43-53) — compact + sink write, one plan. */
  def compactTo(env: DataFrame, write: DataFrame => Unit): Unit = write(compact(env))

  /** collect_value_set — distinct set of value payloads
    * (kafi/addons.py:210-219). Map-side partial distinct then exchange —
    * the canonical two-phase distinct. */
  def collectValueSet(env: DataFrame): DataFrame =
    env.filter(col("value").isNotNull).select("value").distinct()

  /** repeat — re-produce the last n messages per partition with fresh offsets
    * past the high watermark (kafi/addons.py:57-65). */
  def repeat(env: DataFrame, nPerPartition: Int): DataFrame = {
    val hw = env.groupBy("partition").agg(max("offset").as("__hw"))
    env.join(broadcast(hw), Seq("partition"))
      .filter(col("offset") > col("__hw") - nPerPartition)
      .withColumn("offset", col("offset") + nPerPartition)
      .drop("__hw")
  }

  /** message_size / message_size_stats — byte-size stats over key+value
    * (kafi/addons.py:158-207). One aggregation pass. Sizes are UTF-8 octets
    * (octet_length), matching the reference's serialized-byte sizes — plain
    * length() counts characters and understates non-ASCII payloads. */
  def messageSizeStats(env: DataFrame): DataFrame = {
    val sz = coalesce(octet_length(col("key")), lit(0)) + coalesce(octet_length(col("value")), lit(0))
    env
      .withColumn("__size", sz)
      .agg(
        count(lit(1)).as("messages"),
        sum(col("__size")).cast("long").as("total_bytes"),
        (sum(col("__size")).cast("double") / count(lit(1))).as("avg_bytes"),
        min(col("__size")).cast("long").as("min_bytes"),
        max(col("__size")).cast("long").as("max_bytes"))
  }

  /** Exact discrete quantiles of an integer-valued column — the p50/p95/p99
    * companion to [[messageSizeStats]] (size-distribution monitoring,
    * sequence-length budgeting for packing). Returns the value at 0-based
    * sorted rank floor((n-1)·p) for each requested probability — exact
    * rank selection, no interpolation, no sketch error, reproducible across
    * engines by construction (integer ranks, integer values).
    *
    * Scale shape: the full-row sort exact quantiles normally need never
    * happens — rows collapse FIRST to (value, count) via one map-side-
    * combined aggregation, and the cumulative rank walk runs over the
    * DISTINCT VALUES only. Right for bounded-cardinality columns (sizes,
    * token counts, status codes), where |distinct| is thousands at any
    * corpus scale; for genuinely continuous columns bucket first or accept
    * a sketch. The ordered cumulative sum over distinct values is a window
    * WITHOUT partitioning — acceptable exactly because its input is the
    * collapsed value table, not the corpus. */
  def quantilesExact(df: DataFrame, valueCol: Column, probs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // nulls (and non-castable values) are ignored, the contract of every
    // SQL percentile; n comes from the collapsed table — never a second
    // full scan of the input
    val counts = df.select(valueCol.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("__v").agg(count(lit(1)).as("__c"))
    val cum = counts.withColumn("__cum",
      sum(col("__c")).over(org.apache.spark.sql.expressions.Window
        .orderBy("__v").rowsBetween(Long.MinValue, 0)))
    val targets = counts.agg(sum("__c").as("__n"))
      .crossJoin(broadcast(probs.toDF("p")))
      .select(col("p"), floor((col("__n") - 1) * col("p")).cast("long").as("__idx"))
    // value at rank idx = first value whose cumulative count exceeds idx
    cum.join(broadcast(targets), col("__cum") > col("__idx"))
      .groupBy("p").agg(min(col("__v")).as("value"))
  }

  /** Per-group [[quantilesExact]]: one row per (group, probability). Same
    * collapse-first shape with every step partitioned by the group — the
    * cumulative window is PARTITIONED (hot groups parallelize across
    * groups, distinct values only), targets derive from per-group totals,
    * and the rank walk joins on (group, cum > idx). Output: (groupCol, p,
    * value). */
  def quantilesExactBy(df: DataFrame, groupCol: String, valueCol: Column,
      probs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(col(groupCol).as("__g"), valueCol.cast("long").as("__v"))
      .filter(col("__v").isNotNull) // same ignore-nulls contract as the ungrouped form
      .groupBy("__g", "__v").agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy("__g").agg(sum("__c").as("__n"))
    val targets = totals
      .crossJoin(broadcast(probs.toDF("p")))
      .select(col("__g").as("__tg"), col("p"),
        floor((col("__n") - 1) * col("p")).cast("long").as("__idx"))
    val cum = counts.withColumn("__cum",
      sum(col("__c")).over(org.apache.spark.sql.expressions.Window
        .partitionBy("__g").orderBy("__v").rowsBetween(Long.MinValue, 0)))
    // <=> so a NULL group keeps its quantiles instead of silently vanishing
    cum.join(targets, col("__g") <=> col("__tg") && col("__cum") > col("__idx"))
      .groupBy(col("__g").as(groupCol), col("p"))
      .agg(min(col("__v")).as("value"))
  }

  /** offsets_diff — message counts between two timestamps per partition
    * (kafi/addons.py:133-154). The timestamp range predicate is pushed to the
    * scan (row-group pruning on a time-partitioned layout). */
  def offsetsDiff(env: DataFrame, fromMs: Long, untilMs: Long): DataFrame =
    env
      .filter(Envelope.tsMs(col("timestamp")) >= fromMs &&
        Envelope.tsMs(col("timestamp")) < untilMs)
      .groupBy("partition")
      .agg(count(lit(1)).as("n_messages"))

  /** watermarks — (low, high) offset per partition
    * (kafi/fs/fs_admin.py:156-183, cluster_admin.py:276-290). */
  def watermarks(env: DataFrame): DataFrame =
    env.groupBy("partition")
      .agg(min("offset").cast("long").as("low"),
        (max("offset") + 1).cast("long").as("high"))

  /** lags — high watermark minus committed offset per partition
    * (kafi/storage.py:245-255). `committed` is a (partition, offset) frame,
    * e.g. from FileStorage group state; broadcast — it is |partitions| rows. */
  def lags(env: DataFrame, committed: DataFrame): DataFrame =
    watermarks(env)
      .join(broadcast(committed), Seq("partition"), "left")
      .withColumn("lag", col("high") - coalesce(col("committed"), col("low")))
      .select("partition", "high", "committed", "lag")
}
