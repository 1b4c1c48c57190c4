package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Envelope
import graft.ops.AddOns

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate the per-module registries under
  * graft.queries; each implemented operator from SURVEY §2 is registered
  * there with a DuckDB-runnable oracle where SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A real multi-operator pipeline: envelope read → JSON decode → compact
    * (last-per-key + tombstones) → broadcast join to customer dim →
    * per-user aggregate.
    */
  /** read → decode → compact → broadcast join → windowed agg. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val env = Envelope.fromEvents(spark, dir)
    val decoded = env.withColumn("k", get_json_object(col("value"), "$.k").cast("long"))
    val compacted = AddOns.compact(decoded)
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    graft.streams.Windows.tumbling(
      compacted.join(broadcast(customer), col("user_id") + 1 === col("c_custkey")),
      col("timestamp"), 7L * 86400000L, Seq(col("c_mktsegment")))(
      count(lit(1)).as("n"), sum("k").as("sum_k"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.BatchQueries.queries ++
      graft.queries.ZSetQueries.queries ++
      graft.queries.WindowQueries.queries ++
      graft.queries.SerdeQueries.queries ++
      graft.queries.LlmQueries.queries ++
      graft.queries.StorageQueries.queries ++
      graft.queries.TpchQueries.queries ++
      graft.queries.ScaleQueries.queries ++
      graft.queries.TemporalQueries.queries ++
      graft.queries.FuzzyQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.BatchQueries.oracles ++
      graft.queries.ZSetQueries.oracles ++
      graft.queries.WindowQueries.oracles ++
      graft.queries.SerdeQueries.oracles ++
      graft.queries.LlmQueries.oracles ++
      graft.queries.StorageQueries.oracles ++
      graft.queries.TpchQueries.oracles ++
      graft.queries.ScaleQueries.oracles ++
      graft.queries.TemporalQueries.oracles ++
      graft.queries.FuzzyQueries.oracles
}
