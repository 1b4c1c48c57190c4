package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shell-like surface over a message-envelope DataFrame.
  *
  * Capability parity with the reference's `Shell` mixin (kafi/shell.py:14-101):
  * cat / head / tail / cp / wc / grep. All operators are declarative Column
  * plans — no driver-side materialization, Catalyst pushes filters into the
  * scan (offset/partition predicates reach parquet row-group pruning).
  */
object Shell {

  /** cat — materialize the topic in (partition, offset) order
    * (kafi/shell.py:14-16). */
  def cat(env: DataFrame): DataFrame =
    env.orderBy("partition", "offset")

  /** head — first `nPerPartition` messages of each partition; the fair-share
    * deterministic analogue of "consume n from the start"
    * (kafi/shell.py:18-24). Resolved against the LOW watermark (a truncated
    * log does not start at offset 0 — cluster_admin.py:292-315
    * delete_records moves it), mirroring how tail resolves against the high
    * watermark; the broadcast side is |partitions| rows.
    */
  def head(env: DataFrame, nPerPartition: Int): DataFrame = {
    val lw = env.groupBy("partition").agg(min("offset").as("__lw"))
    env.join(broadcast(lw), Seq("partition"))
      .filter(col("offset") < col("__lw") + nPerPartition)
      .drop("__lw")
      .orderBy("partition", "offset")
  }

  /** tail — last n per partition: negative-offset resolution against the high
    * watermarks (kafi/shell.py:26-34, kafi/storage_consumer.py:199-231).
    *
    * Implemented as an aggregate of per-partition high watermarks broadcast
    * back onto the log, NOT a global sort: at 100 TB the watermark side is
    * |partitions| rows, so the join is a broadcast and the scan stays
    * full-parallel.
    */
  def tail(env: DataFrame, nPerPartition: Int): DataFrame = {
    val hw = env.groupBy("partition").agg(max("offset").as("__hw"))
    env.join(broadcast(hw), Seq("partition"))
      .filter(col("offset") > col("__hw") - nPerPartition)
      .drop("__hw")
      .orderBy("partition", "offset")
  }

  /** wc — message / word / byte counts (kafi/shell.py:46-67). Words are
    * single-space-split tokens of the value payload; tombstones count 0. */
  def wc(env: DataFrame): DataFrame =
    env.agg(
      count(lit(1)).as("messages"),
      sum(when(col("value").isNull, 0)
        .otherwise(size(split(col("value"), " ")))).cast("long").as("words"),
      sum(coalesce(octet_length(col("key")), lit(0)) +
        coalesce(octet_length(col("value")), lit(0))).cast("long").as("bytes"))

  /** grep — regex match over key/value (kafi/shell.py:71-101). The rlike
    * predicate is codegen'd and evaluated inside the scan stage. */
  def grep(env: DataFrame, pattern: String): DataFrame =
    env.filter(col("value").rlike(pattern) || col("key").rlike(pattern))
      .orderBy("partition", "offset")

  /** cp — topic copy with an optional transform (kafi/shell.py:38-42);
    * the caller writes the result via a Storage sink. One plan, read→write,
    * no intermediate materialization. */
  def cp(env: DataFrame, transform: DataFrame => DataFrame = identity): DataFrame =
    transform(env)

  /** diff — pairwise message comparison of two topics by log coordinate
    * (the capability the reference's cross-storage suite calls but never
    * defines, test/test_cross_storage.py:617-634): full outer join on
    * (partition, offset), emitting coordinates whose key or value differ —
    * including one-sided rows. `side` says where the divergence lives.
    * One shuffle per side, keyed by the coordinate. */
  def diff(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("partition"), col("offset"),
      col("key").as("key_a"), col("value").as("value_a"), lit(true).as("__inA"))
    val r = b.select(col("partition"), col("offset"),
      col("key").as("key_b"), col("value").as("value_b"), lit(true).as("__inB"))
    l.join(r, Seq("partition", "offset"), "full_outer")
      .filter(
        !coalesce(col("__inA"), lit(false)) || !coalesce(col("__inB"), lit(false)) ||
          !(col("key_a") <=> col("key_b")) || !(col("value_a") <=> col("value_b")))
      .withColumn("side",
        when(col("__inA").isNull, "only_b")
          .when(col("__inB").isNull, "only_a")
          .otherwise("both_differ"))
      .drop("__inA", "__inB")
  }
}
