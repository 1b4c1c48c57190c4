package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format bridges (kafi/files.py:15-85): topic ↔ csv/json/parquet.
  * Local paths, s3a://, abfss:// are all just Hadoop FS URIs (SURVEY §2.1
  * "Local/S3/AzureBlob I/O" — the connectors make the backends uniform).
  * xlsx/xml are out of scope per SURVEY §7.5.
  */
object Files {

  /** topic_to_file (kafi/files.py:15-56). One plan: read→write, distributed
    * writers, no driver materialization (unlike the reference's pandas hop). */
  def topicToFile(df: DataFrame, path: String, format: String): Unit =
    format match {
      case "csv" => df.write.mode("overwrite").option("header", "true").csv(path)
      case "json" => df.write.mode("overwrite").json(path)
      case "parquet" => df.write.mode("overwrite").parquet(path)
      case other => df.write.mode("overwrite").format(other).save(path)
    }

  /** file_to_topic (kafi/files.py:58-85); explicit schema keeps types stable
    * across formats (csv/json are untyped on disk). */
  def fileToTopic(spark: SparkSession, path: String, format: String, schema: StructType): DataFrame =
    format match {
      case "csv" => spark.read.option("header", "true").schema(schema).csv(path)
      case "json" => spark.read.schema(schema).json(path)
      case "parquet" => spark.read.parquet(path)
      case other => spark.read.schema(schema).format(other).load(path)
    }
}
