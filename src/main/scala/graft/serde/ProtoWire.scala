package graft.serde

import java.io.ByteArrayOutputStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal protobuf wire-format codec (proto3 scalar subset): varint,
  * fixed64 and length-delimited fields — enough to produce/consume flat
  * scalar messages without a schema-compiler dependency.
  *
  * The reference decodes protobuf payloads through a registered descriptor
  * (kafi/deserializer.py:78-97); Spark's equivalent is `from_protobuf` in
  * the external spark-protobuf module (absent from this container). This
  * codec keeps the wire path REAL in the meantime: encode/decode run as
  * typed mapPartitions kernels (JIT'd byte loops, same shape as AvroSerde),
  * and a deployment swaps them for from_protobuf/to_protobuf without
  * touching the plan around them. Unknown fields are skipped by wire type,
  * as the spec requires; the Confluent 5-byte prefix composes via
  * Serde.confluent*.
  */
object ProtoWire {

  // ---- wire primitives ----

  def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** (value, next position). A valid varint is at most 10 bytes; anything
    * longer (or running off the buffer) throws instead of silently folding
    * high bits back into low positions (Scala's << wraps shifts mod 64). */
  def readVarint(b: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var p = pos
    while ({
      if (shift > 63) throw new IllegalArgumentException(s"overlong varint at $pos")
      if (p >= b.length) throw new IllegalArgumentException(s"truncated varint at $pos")
      val x = b(p) & 0xFF
      v |= (x & 0x7FL) << shift
      p += 1
      shift += 7
      (x & 0x80) != 0
    }) ()
    (v, p)
  }

  private def writeKey(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, (field.toLong << 3) | wire)

  private def writeFixed64(out: ByteArrayOutputStream, bits: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  private def readFixed64(b: Array[Byte], pos: Int): Long = {
    var bits = 0L; var i = 0
    while (i < 8) { bits |= (b(pos + i) & 0xFFL) << (8 * i); i += 1 }
    bits
  }

  /** Skip a field of the given wire type; returns the next position. */
  def skip(b: Array[Byte], pos: Int, wire: Int): Int = wire match {
    case 0 => readVarint(b, pos)._2
    case 1 => pos + 8
    case 2 => val (len, p) = readVarint(b, pos); p + len.toInt
    case 5 => pos + 4
    case w => throw new IllegalArgumentException(s"unsupported wire type $w")
  }

  // ---- demo message: Event { int64 event_id = 1; string event_type = 2;
  //                            double value = 3; } ----

  /** (event_id, event_type, value) rows → proto bytes. */
  def encodeEvents(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("event_id").cast("long"), col("event_type"), col("value").cast("double"))
      .as[(Long, String, Double)]
      .mapPartitions(_.map { case (id, et, v) =>
        val out = new ByteArrayOutputStream()
        writeKey(out, 1, 0); writeVarint(out, id)
        val etb = et.getBytes("UTF-8")
        writeKey(out, 2, 2); writeVarint(out, etb.length.toLong); out.write(etb, 0, etb.length)
        writeKey(out, 3, 1); writeFixed64(out, java.lang.Double.doubleToLongBits(v))
        (id, out.toByteArray)
      })
      .toDF("event_id", "proto")
  }

  /** proto bytes → (event_id, event_type, value); unknown fields skipped. */
  def decodeEvents(df: DataFrame, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(binCol)).as[Array[Byte]]
      .mapPartitions(_.map { b =>
        var id = 0L; var et = ""; var v = 0.0
        var p = 0
        while (p < b.length) {
          val (key, p1) = readVarint(b, p)
          val field = (key >>> 3).toInt
          val wire = (key & 7).toInt
          (field, wire) match {
            case (1, 0) => val (x, p2) = readVarint(b, p1); id = x; p = p2
            case (2, 2) =>
              val (len, p2) = readVarint(b, p1)
              et = new String(b, p2, len.toInt, "UTF-8"); p = p2 + len.toInt
            case (3, 1) =>
              v = java.lang.Double.longBitsToDouble(readFixed64(b, p1)); p = p1 + 8
            case _ => p = skip(b, p1, wire)
          }
        }
        (id, et, v)
      })
      .toDF("event_id", "event_type", "value")
  }
}
