package graft.serde

import java.io.ByteArrayOutputStream
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Avro payload serde (kafi/deserializer.py:59-77, serializer.py:89-106):
  * binary Avro body ⇄ JSON-string view of the record, with the Confluent
  * 5-byte wire prefix handled by graft.serde.Serde.confluent*.
  *
  * Spark's `from_avro`/`to_avro` live in the external spark-avro module
  * (absent from this container), so decode/encode run on the Apache Avro
  * core library inside a typed mapPartitions kernel — schema parsed ONCE
  * per partition, records streamed (the same batch shape a deployment
  * would swap for `from_avro` + a schema-registry lookup). The JSON-string
  * output feeds `from_json` for typed columnar access.
  */
object AvroSerde {

  /** (id, avroBytes) → (id, json). `stripConfluent` drops the magic byte +
    * schema id first (deserializer.py:104-123).
    *
    * CAUTION: decoding Confluent-framed bytes with stripConfluent=false
    * does NOT error — binary Avro has no framing, so the 0x00 magic byte
    * parses as a valid varint and yields a silently WRONG record. Know
    * your payload's wire format. */
  def decodeToJson(df: DataFrame, idCol: String, binCol: String, schemaJson: String,
      stripConfluent: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        val reader = new GenericDatumReader[GenericRecord](schema)
        val writer = new GenericDatumWriter[GenericRecord](schema)
        it.map { case (id, bytes) =>
          // corrupt record → null json, never a task-killing throw: binary
          // Avro is unframed, so truncated/flipped bytes surface as
          // EOF/ArrayIndex/Avro exceptions mid-read (round-13 posture,
          // shared with the media decoders and ProtoWire.decode)
          try {
            val body = if (stripConfluent) bytes.drop(5) else bytes
            val dec = DecoderFactory.get().binaryDecoder(body, null)
            val rec = reader.read(null, dec)
            // Real Avro JSON (not GenericRecord.toString): unions keep their
            // branch wrapper and bytes/fixed escape correctly, so the output
            // feeds encodeFromJson's jsonDecoder losslessly.
            val out = new ByteArrayOutputStream()
            val enc = EncoderFactory.get().jsonEncoder(schema, out)
            writer.write(rec, enc)
            enc.flush()
            (id, out.toString("UTF-8"))
          } catch {
            case scala.util.control.NonFatal(_) => (id, null: String)
          }
        }
      }
      .toDF(idCol, "json")
  }

  /** (id, json) → (id, avroBytes): the write side (serializer.py:89-106). */
  def encodeFromJson(df: DataFrame, idCol: String, jsonCol: String, schemaJson: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(jsonCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        val reader = new GenericDatumReader[GenericRecord](schema)
        val writer = new GenericDatumWriter[GenericRecord](schema)
        it.map { case (id, json) =>
          // malformed JSON → null bytes (same never-throw posture as decode)
          try {
            val rec = reader.read(null, DecoderFactory.get().jsonDecoder(schema, json))
            val out = new ByteArrayOutputStream()
            val enc = EncoderFactory.get().binaryEncoder(out, null)
            writer.write(rec, enc)
            enc.flush()
            (id, out.toByteArray)
          } catch {
            case scala.util.control.NonFatal(_) => (id, null: Array[Byte])
          }
        }
      }
      .toDF(idCol, "avro")
  }
}
