package graft.serde

import java.io.ByteArrayOutputStream
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  // ---- runtime descriptors (the generic path) ----

  /** A flat proto3 message descriptor, parsed at runtime from `.proto`
    * text — the analogue of the reference's runtime schema compilation
    * (kafi/serializer.py:108-123 pipes user schema text through protoc at
    * runtime; here a single-message scalar subset is parsed directly, no
    * compiler round-trip). Supported field types: int32/int64/uint32/
    * uint64/sint32/sint64 (→ long), bool, double, float, string, bytes. */
  case class ProtoField(number: Int, name: String, ptype: String)
  case class ProtoMessage(name: String, fields: Seq[ProtoField])

  private val scalarTypes = Set(
    "int32", "int64", "uint32", "uint64", "sint32", "sint64",
    "bool", "double", "float", "string", "bytes")

  private val messageRe = """message\s+(\w+)\s*\{([^}]*)\}""".r
  // optional leading label captured so `repeated` is REJECTED, not silently
  // parsed as a singular scalar (unpacked repeated data would decode to the
  // last element only — silent wrong data); `optional` is wire-identical to
  // singular in proto3 and accepted
  private val fieldRe = """(?:(repeated|optional|required)\s+)?(\w+)\s+(\w+)\s*=\s*(\d+)\s*;""".r

  /** Parse the FIRST message in a `.proto` text. Comments (`//`) are
    * stripped; `syntax`/`package` lines and unknown options are ignored.
    * Non-scalar shapes (repeated, map, oneof, nested messages) throw
    * instead of mis-decoding. */
  def parseDescriptor(protoText: String): ProtoMessage = {
    val clean = protoText.linesIterator.map(l => l.takeWhile(_ != '/')).mkString("\n")
    val m = messageRe.findFirstMatchIn(clean).getOrElse(
      throw new IllegalArgumentException("no message block in descriptor"))
    val body = m.group(2)
    require(!body.contains("map<") && !body.contains("oneof"),
      "map/oneof fields unsupported (flat scalar subset)")
    val fields = fieldRe.findAllMatchIn(body).map { fm =>
      val label = fm.group(1)
      require(label == null || label == "optional",
        s"unsupported field label '$label' (flat scalar subset; repeated would mis-decode)")
      val t = fm.group(2)
      require(scalarTypes(t), s"unsupported field type $t (flat scalar subset)")
      ProtoField(fm.group(4).toInt, fm.group(3), t)
    }.toSeq
    require(fields.nonEmpty, s"message ${m.group(1)} has no scalar fields")
    require(fields.map(_.number).distinct.size == fields.size, "duplicate field numbers")
    ProtoMessage(m.group(1), fields)
  }

  /** The Spark schema a descriptor decodes to. Unsigned 64-bit values land
    * in Long two's-complement (documented; Spark has no unsigned type). */
  def sparkSchema(msg: ProtoMessage): StructType =
    StructType(msg.fields.map(f => StructField(f.name, f.ptype match {
      case "bool" => BooleanType
      case "double" => DoubleType
      case "float" => FloatType
      case "string" => StringType
      case "bytes" => BinaryType
      case _ => LongType
    })))

  private def zigzagEncode(v: Long): Long = (v << 1) ^ (v >> 63)
  private def zigzagDecode(u: Long): Long = (u >>> 1) ^ -(u & 1L)

  /** Encode `df`'s columns (matched by descriptor field NAME) into a
    * `proto` bytes column, keeping `keep` columns alongside. Null values
    * are omitted from the wire — proto3 semantics: absent decodes to the
    * type's default (0 / "" / false / empty). Typed kernel, one pass. */
  def encode(df: DataFrame, msg: ProtoMessage, keep: Seq[String]): DataFrame = {
    val schema = sparkSchema(msg)
    val in = df.select(
      keep.map(col) ++
        msg.fields.map(f => col(f.name).cast(schema(f.name).dataType)): _*)
    val outSchema = StructType(keep.map(in.schema(_)) :+ StructField("proto", BinaryType))
    val nKeep = keep.length
    val fields = msg.fields.toArray
    in.mapPartitions { rows =>
      rows.map { row =>
        val out = new ByteArrayOutputStream()
        var i = 0
        while (i < fields.length) {
          val f = fields(i)
          val idx = nKeep + i
          if (!row.isNullAt(idx)) f.ptype match {
            case "string" =>
              val b = row.getString(idx).getBytes("UTF-8")
              writeKey(out, f.number, 2); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
            case "bytes" =>
              val b = row.getAs[Array[Byte]](idx)
              writeKey(out, f.number, 2); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
            case "double" =>
              writeKey(out, f.number, 1)
              writeFixed64(out, java.lang.Double.doubleToLongBits(row.getDouble(idx)))
            case "float" =>
              writeKey(out, f.number, 5)
              val bits = java.lang.Float.floatToIntBits(row.getFloat(idx))
              var k = 0
              while (k < 4) { out.write((bits >>> (8 * k)) & 0xFF); k += 1 }
            case "bool" =>
              writeKey(out, f.number, 0); writeVarint(out, if (row.getBoolean(idx)) 1L else 0L)
            case "sint32" | "sint64" =>
              writeKey(out, f.number, 0); writeVarint(out, zigzagEncode(row.getLong(idx)))
            case _ =>
              writeKey(out, f.number, 0); writeVarint(out, row.getLong(idx))
          }
          i += 1
        }
        Row.fromSeq((0 until nKeep).map(row.get) :+ out.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  /** Decode a bytes column through the descriptor: one output column per
    * descriptor field (absent fields → proto3 defaults), `keep` columns
    * passed through, unknown field numbers skipped by wire type. */
  def decode(df: DataFrame, binCol: String, msg: ProtoMessage, keep: Seq[String] = Nil): DataFrame = {
    val valueSchema = sparkSchema(msg)
    val in = df.select(keep.map(col) :+ col(binCol).cast("binary"): _*)
    val outSchema = StructType(keep.map(in.schema(_)) ++ valueSchema.fields)
    val nKeep = keep.length
    val byNumber: Map[Int, (Int, String)] =
      msg.fields.zipWithIndex.map { case (f, i) => f.number -> (i, f.ptype) }.toMap
    val fields = msg.fields.toArray
    in.mapPartitions { rows =>
      rows.map { row =>
        val values = new Array[Any](fields.length)
        var i = 0
        while (i < fields.length) { // proto3 defaults for absent fields
          values(i) = fields(i).ptype match {
            case "string" => ""
            case "bytes" => Array.emptyByteArray
            case "double" => 0.0
            case "float" => 0.0f
            case "bool" => false
            case _ => 0L
          }
          i += 1
        }
        val b = row.getAs[Array[Byte]](nKeep)
        var p = 0
        while (p < b.length) {
          val (key, p1) = readVarint(b, p)
          val wire = (key & 7).toInt
          byNumber.get((key >>> 3).toInt) match {
            case Some((idx, ptype)) => (ptype, wire) match {
              case ("string", 2) =>
                val (len, p2) = readVarint(b, p1)
                values(idx) = new String(b, p2, len.toInt, "UTF-8"); p = p2 + len.toInt
              case ("bytes", 2) =>
                val (len, p2) = readVarint(b, p1)
                values(idx) = java.util.Arrays.copyOfRange(b, p2, p2 + len.toInt); p = p2 + len.toInt
              case ("double", 1) =>
                values(idx) = java.lang.Double.longBitsToDouble(readFixed64(b, p1)); p = p1 + 8
              case ("float", 5) =>
                var bits = 0; var k = 0
                while (k < 4) { bits |= (b(p1 + k) & 0xFF) << (8 * k); k += 1 }
                values(idx) = java.lang.Float.intBitsToFloat(bits); p = p1 + 4
              case ("bool", 0) =>
                val (v, p2) = readVarint(b, p1); values(idx) = v != 0L; p = p2
              case ("sint32" | "sint64", 0) =>
                val (v, p2) = readVarint(b, p1); values(idx) = zigzagDecode(v); p = p2
              case ("int32" | "int64" | "uint32" | "uint64", 0) =>
                val (v, p2) = readVarint(b, p1); values(idx) = v; p = p2
              // wire/descriptor type mismatch (e.g. writer sent a varint
              // where the descriptor says string): skip, keep the default —
              // an open catch-all on wire 0 here would store a Long into a
              // non-long field and kill the row encoder
              case _ => p = skip(b, p1, wire)
            }
            case None => p = skip(b, p1, wire)
          }
        }
        Row.fromSeq((0 until nKeep).map(row.get) ++ values)
      }
    }(Encoders.row(outSchema))
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
