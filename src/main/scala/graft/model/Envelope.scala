package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** The message envelope — the single fundamental record type of the engine.
  *
  * Mirrors the reference's 7-field message dict (kafi/storage_consumer.py:132-138)
  * re-expressed as a fixed Spark schema, aligned with Spark's own Kafka source
  * schema so `spark.read.format("kafka")` output drops straight in. The streams
  * half adds one more column, `weight: long` (Z-set algebra, see graft.streams.ZSet).
  *
  * Scale note: everything downstream treats (partition, offset) as the log
  * coordinates; all per-partition operations (tail, watermarks, offset seeks)
  * shuffle at most by `partition`, matching how a real Kafka-backed cluster
  * would parallelize.
  */
object Envelope {

  /** Partition count used when emulating the hash-of-key partitioner
    * (reference kafi/helpers.py:338-352) over driver test data. */
  val NumPartitions = 4

  val headersType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType))))

  /** Canonical envelope schema (SURVEY §1.2). `key`/`value` are kept as
    * strings at this layer; binary payloads travel through graft.serde. */
  val schema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType),
    StructField("headers", headersType)))

  val columnNames: Seq[String] =
    Seq("key", "value", "topic", "partition", "offset", "timestamp", "timestampType", "headers")

  /** Build a message-log envelope view over the driver's `events` table.
    *
    * - partition = user_id % NumPartitions — deterministic stand-in for the
    *   hash-of-key partitioner (kafi/helpers.py:338-352); key ↔ partition is
    *   stable like Kafka's default partitioner guarantees.
    * - offset = dense per-partition sequence ordered by event_id — the FS
    *   producer's offset assignment (kafi/fs/fs_producer.py:53-70).
    * - value = props JSON payload; `click` events become tombstones
    *   (null value) so compaction semantics are exercised
    *   (kafi/addons.py:19-41).
    *
    * Original analytic columns (event_id, user_id, event_type, amount, ts) are
    * retained alongside the envelope so operator queries can reference them.
    *
    * Scale note: the row_number window shuffles by `partition` — this mirrors
    * the per-partition sequential offset assignment a log store does natively;
    * on a real Kafka source offsets arrive pre-assigned and this step is a
    * no-op projection.
    */
  /** Read the events table, normalizing its nanosecond parquet timestamp
    * (which Spark 4 refuses by default) to a microsecond TimestampType via
    * the nanosAsLong legacy read + an explicit ns→µs conversion. */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = TableCache.parquet(spark, s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        // integer div — a double division would lose ulps at 1e18 ns
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }

  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = readEvents(spark, sfDir)
      .withColumnRenamed("value", "amount")
    ev
      .withColumn("partition", (col("user_id") % NumPartitions).cast(IntegerType))
      .withColumn(
        "offset",
        (row_number().over(
          Window.partitionBy("partition").orderBy("event_id")) - 1).cast(LongType))
      .withColumn("key", col("user_id").cast(StringType))
      .withColumn(
        "value",
        when(col("event_type") === "click", lit(null).cast(StringType))
          .otherwise(col("props")))
      .withColumn("topic", lit("events"))
      .withColumn("timestamp", col("ts"))
      .withColumn("timestampType", lit(1)) // TIMESTAMP_CREATE_TIME (fs_producer.py:36-37)
      .withColumn("headers", lit(null).cast(headersType))
  }

  /** Adapt Spark's Kafka-source output (key/value binary, topic, partition,
    * offset, timestamp, timestampType, headers) to the canonical envelope:
    * a projection + UTF-8 decode — the schemas are aligned by design, so a
    * Kafka-backed deployment feeds every operator here unchanged. */
  def fromKafkaSource(df: DataFrame): DataFrame =
    df.select(
      decode(col("key"), "UTF-8").as("key"),
      decode(col("value"), "UTF-8").as("value"),
      col("topic"),
      col("partition"),
      col("offset"),
      col("timestamp"),
      col("timestampType"),
      (if (df.columns.contains("headers")) col("headers")
       else lit(null).cast(headersType)).as("headers"))

  /** Millisecond view of a timestamp column (the reference's native
    * timestamp unit, kafi/helpers.py:30-39). Accepts NTZ timestamps too
    * (session timezone is pinned to UTC, so the cast is an identity). */
  def tsMs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unix_millis(c.cast(TimestampType))
}
