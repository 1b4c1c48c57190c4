package graft.serde

import java.io.ByteArrayOutputStream
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
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

  private def readFixed32(b: Array[Byte], pos: Int): Int = {
    var bits = 0; var i = 0
    while (i < 4) { bits |= (b(pos + i) & 0xFF) << (8 * i); i += 1 }
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

  /** A proto3 message descriptor, parsed at runtime from `.proto` text —
    * the analogue of the reference's runtime schema compilation
    * (kafi/serializer.py:108-123 pipes user schema text through protoc at
    * runtime; here the text is parsed directly, no compiler round-trip).
    *
    * Supported: scalar fields int32/int64/uint32/uint64/sint32/sint64
    * (→ long), bool, double, float, string, bytes; MESSAGE-typed fields
    * (nested definitions or sibling messages → StructType); `repeated`
    * fields (→ ArrayType; numeric decode accepts both packed and unpacked
    * encodings, encode emits packed for numerics — the proto3 default —
    * and per-element for strings/bytes/messages). `optional`/`required`
    * (proto2 — the reference's own test schemas use it) are wire-identical
    * to singular and accepted. `oneof` members become plain nullable
    * columns with last-member-on-the-wire-wins decode and null = unset
    * (explicit presence); encoding a row with two members set emits both —
    * caller contract, as in the reference. `map<K,V>` fields decode to
    * Spark `MapType` with proto3's last-duplicate-key-wins (wire format:
    * repeated `{key=1, value=2}` entry messages, modeled as a synthetic
    * entry type under a '#' name no parsed message can collide with);
    * scalar keys, scalar or message values. Unsupported and REJECTED at
    * parse (never mis-decoded): recursive message types (no finite Spark
    * schema). */
  case class ProtoField(number: Int, name: String, ptype: String, repeated: Boolean = false,
      oneofGroup: Option[String] = None, isMap: Boolean = false)
  case class ProtoMessage(name: String, fields: Seq[ProtoField],
      types: Map[String, ProtoMessage] = Map.empty) {
    /** field index → sibling indices in the same oneof group (for
      * last-member-wins decode); built once per descriptor, not per row. */
    lazy val oneofSiblings: Map[Int, Array[Int]] = {
      val byGroup = fields.zipWithIndex.collect {
        case (f, i) if f.oneofGroup.isDefined => (f.oneofGroup.get, i)
      }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      byGroup.values.flatMap { idxs =>
        idxs.map(i => i -> idxs.filter(_ != i).toArray)
      }.toMap
    }
  }

  private val scalarTypes = Set(
    "int32", "int64", "uint32", "uint64", "sint32", "sint64",
    "bool", "double", "float", "string", "bytes")

  private val msgOpenRe = """message\s+(\w+)\s*\{""".r
  private val fieldRe = """(?:(repeated|optional|required)\s+)?(\w+)\s+(\w+)\s*=\s*(\d+)\s*;""".r

  /** All message blocks in document order, brace-matched (nested
    * definitions included as separate entries); each body has its nested
    * blocks blanked so the field scan sees only the message's own fields. */
  private def matchBrace(s: String, open: Int): Int = {
    var depth = 1; var i = open
    while (depth > 0) {
      require(i < s.length, "unbalanced braces in descriptor")
      val c = s.charAt(i)
      if (c == '{') depth += 1 else if (c == '}') depth -= 1
      i += 1
    }
    i // index just past the closing brace
  }

  private def collectBlocks(text: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    def blankNested(body: String): String = {
      var s = body
      var m = msgOpenRe.findFirstMatchIn(s)
      while (m.isDefined) {
        val end = matchBrace(s, m.get.end)
        s = s.substring(0, m.get.start) + (" " * (end - m.get.start)) + s.substring(end)
        m = msgOpenRe.findFirstMatchIn(s)
      }
      s
    }
    def walk(s: String): Unit = {
      var from = 0
      var m = msgOpenRe.findFirstMatchIn(s.substring(from))
      while (m.isDefined) {
        val open = from + m.get.end
        val end = matchBrace(s, open)
        val body = s.substring(open, end - 1)
        out += ((m.get.group(1), blankNested(body)))
        walk(body) // register nested definitions
        from = end
        m = msgOpenRe.findFirstMatchIn(s.substring(from))
      }
    }
    walk(text)
    out.toSeq
  }

  /** Parse a `.proto` text; the FIRST message is the root. Comments (`//`)
    * are stripped; `syntax`/`package` lines and unknown options ignored.
    * Message names live in ONE flat namespace here — proto3's
    * parent-qualified nested names (A.Item vs B.Item) are not modeled, so
    * two messages sharing a simple name are rejected at parse rather than
    * silently bound to the wrong type; rename to unique simple names. */
  def parseDescriptor(protoText: String): ProtoMessage = {
    val clean = protoText.linesIterator.map(l => l.takeWhile(_ != '/')).mkString("\n")
    val blocks = collectBlocks(clean)
    require(blocks.nonEmpty, "no message block in descriptor")
    val names = blocks.map(_._1)
    require(names.distinct.size == names.size,
      "duplicate message names in descriptor (flat namespace: qualify nested type names uniquely)")
    val oneofRe = """oneof\s+(\w+)\s*\{""".r
    val mapRe = """map\s*<\s*(\w+)\s*,\s*(\w+)\s*>\s+(\w+)\s*=\s*(\d+)\s*;""".r
    val mapKeyTypes = scalarTypes - "double" - "float" - "bytes" // proto map-key rules
    val syntheticEntries = scala.collection.mutable.ArrayBuffer[(String, Seq[ProtoField])]()
    val fieldsByMsg0 = blocks.map { case (name, rawBody) =>
      // 1) unwrap oneof blocks in place FIRST (so illegal members — maps,
      // repeated — are caught inside the group, not lifted out as plain
      // fields): members are wire-identical to plain singular fields; the
      // group tag drives last-member-wins at decode
      var body = rawBody
      val groupOf = scala.collection.mutable.Map[String, String]()
      var om = oneofRe.findFirstMatchIn(body)
      while (om.isDefined) {
        val m = om.get
        val end = matchBrace(body, m.end)
        val inner = body.substring(m.end, end - 1)
        require(!inner.contains("map<"), s"map fields not allowed inside oneof ($name)")
        fieldRe.findAllMatchIn(inner).foreach { fm =>
          // label token, not substring: a member NAMED repeated_x is legal
          require(fm.group(1) != "repeated", "repeated not allowed inside oneof")
          groupOf(fm.group(3)) = m.group(1)
        }
        body = body.substring(0, m.start) + (" " * (m.end - m.start)) +
          inner + " " + body.substring(end)
        om = oneofRe.findFirstMatchIn(body)
      }
      // 2) map<K,V> → a synthetic repeated entry message {key=1, value=2};
      // the '#' in its name keeps it out of the \w parse namespace
      val mapFields = mapRe.findAllMatchIn(body).map { mm =>
        val (k, v, fname, num) = (mm.group(1), mm.group(2), mm.group(3), mm.group(4).toInt)
        require(mapKeyTypes(k), s"illegal map key type $k")
        require(scalarTypes(v) || names.contains(v), s"unknown map value type $v")
        val entryName = s"$name#${fname}Entry"
        syntheticEntries += ((entryName,
          Seq(ProtoField(1, "key", k), ProtoField(2, "value", v))))
        ProtoField(num, fname, entryName, isMap = true)
      }.toSeq
      body = mapRe.replaceAllIn(body, " ")
      require(!body.contains("map<"), s"unparseable map field in $name")
      val fields = fieldRe.findAllMatchIn(body).map { fm =>
        // proto2's required/optional and proto3's optional are all
        // wire-identical to singular (the reference's own test schemas use
        // `required`: test_single_storage_base.py:51-52); only `repeated`
        // changes the shape
        val label = fm.group(1)
        val t = fm.group(2)
        require(scalarTypes(t) || names.contains(t), s"unknown field type $t")
        ProtoField(fm.group(4).toInt, fm.group(3), t, repeated = label == "repeated",
          oneofGroup = groupOf.get(fm.group(3)))
      }.toSeq ++ mapFields
      require(fields.nonEmpty, s"message $name has no fields")
      require(fields.map(_.number).distinct.size == fields.size,
        s"duplicate field numbers in $name")
      // struct column order = field-number order (canonical; also keeps
      // map fields, parsed separately, at their declared numbers)
      (name, fields.sortBy(_.number))
    }
    val fieldsByMsg = fieldsByMsg0 ++ syntheticEntries
    // resolve message references bottom-up; a cycle (direct or mutual) has
    // no finite Spark schema and is rejected rather than looping
    val built = scala.collection.mutable.Map[String, ProtoMessage]()
    var remaining = fieldsByMsg
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition { case (_, fs) =>
        fs.forall(f => scalarTypes(f.ptype) || built.contains(f.ptype))
      }
      require(ready.nonEmpty,
        s"recursive message types unsupported: ${blocked.map(_._1).mkString(", ")}")
      ready.foreach { case (n, fs) =>
        val deps = fs.map(_.ptype).filter(built.contains).map(t => t -> built(t)).toMap
        built(n) = ProtoMessage(n, fs, deps)
      }
      remaining = blocked
    }
    built(blocks.head._1)
  }

  /** The Spark schema a descriptor decodes to. Unsigned 64-bit values land
    * in Long two's-complement (documented; Spark has no unsigned type). */
  def sparkSchema(msg: ProtoMessage): StructType =
    StructType(msg.fields.map(f => StructField(f.name, fieldDataType(msg, f))))

  private def fieldDataType(msg: ProtoMessage, f: ProtoField): DataType = {
    if (f.isMap) {
      val e = msg.types(f.ptype)
      return MapType(fieldDataType(e, e.fields(0)), fieldDataType(e, e.fields(1)))
    }
    val base = msg.types.get(f.ptype) match {
      case Some(sub) => sparkSchema(sub)
      case None => f.ptype match {
        case "bool" => BooleanType
        case "double" => DoubleType
        case "float" => FloatType
        case "string" => StringType
        case "bytes" => BinaryType
        case _ => LongType
      }
    }
    if (f.repeated) ArrayType(base) else base
  }

  private def zigzagEncode(v: Long): Long = (v << 1) ^ (v >> 63)
  private def zigzagDecode(u: Long): Long = (u >>> 1) ^ -(u & 1L)

  private def writeFixed32(out: ByteArrayOutputStream, bits: Int): Unit = {
    var k = 0
    while (k < 4) { out.write((bits >>> (8 * k)) & 0xFF); k += 1 }
  }

  private def writeLenDelim(out: ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
    writeKey(out, field, 2); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
  }

  /** One packed element — no key, just the value bytes. */
  private def writePackedScalar(out: ByteArrayOutputStream, ptype: String, x: Any): Unit =
    ptype match {
      case "double" => writeFixed64(out, java.lang.Double.doubleToLongBits(x.asInstanceOf[Double]))
      case "float" => writeFixed32(out, java.lang.Float.floatToIntBits(x.asInstanceOf[Float]))
      case "bool" => writeVarint(out, if (x.asInstanceOf[Boolean]) 1L else 0L)
      case "sint32" | "sint64" => writeVarint(out, zigzagEncode(x.asInstanceOf[Long]))
      case _ => writeVarint(out, x.asInstanceOf[Long])
    }

  private def wireOf(ptype: String): Int = ptype match {
    case "double" => 1
    case "float" => 5
    case _ => 0
  }

  /** True when `in`'s struct field names already sit in `want`'s order at
    * every depth — then a positional cast IS a by-name cast. */
  private def nameAligned(in: DataType, want: DataType): Boolean = (in, want) match {
    case (s: StructType, w: StructType) =>
      s.fields.length == w.fields.length &&
        s.fields.zip(w.fields).forall { case (a, b) =>
          a.name == b.name && nameAligned(a.dataType, b.dataType) }
    case (ArrayType(a, _), ArrayType(b, _)) => nameAligned(a, b)
    case (MapType(_, a, _), MapType(_, b, _)) => nameAligned(a, b)
    case _ => true
  }

  /** Cast `c` to the descriptor's type with struct fields matched BY NAME
    * at every depth — a bare `cast` binds struct fields positionally, so a
    * caller building `struct(b, a)` against a descriptor ordered (a, b)
    * would silently encode swapped values. When the input's names already
    * match descriptor order (every decode output and in-order caller), this
    * is ONE codegen'd cast; the field-shuffling fallback — whose
    * array-of-struct case rides the interpreted `transform` HOF — runs only
    * for genuinely reordered inputs. */
  private def aligned(c: Column, in: DataType, want: DataType): Column =
    if (nameAligned(in, want)) c.cast(want)
    else (in, want) match {
      case (is: StructType, st: StructType) =>
        when(c.isNull, lit(null).cast(st)).otherwise(
          struct(st.fields.toSeq.map(f =>
            aligned(c.getField(f.name), is(f.name).dataType, f.dataType).as(f.name)): _*))
      case (ArrayType(ie, _), ArrayType(et: StructType, _)) =>
        transform(c, x => aligned(x, ie, et))
      case (MapType(_, ivt, _), mt @ MapType(_, wvt: StructType, _)) =>
        transform_values(c, (_, v) => aligned(v, ivt, wvt)).cast(mt)
      case _ => c.cast(want)
    }

  /** Encode the fields of `msg` read from `row` starting at `offset`.
    * Null values (and null array elements) are omitted from the wire —
    * proto3 semantics: absent decodes to the type's default. */
  private def encodeMessage(out: ByteArrayOutputStream, msg: ProtoMessage,
      row: Row, offset: Int): Unit = {
    val fields = msg.fields
    var i = 0
    while (i < fields.length) {
      val f = fields(i)
      val idx = offset + i
      if (!row.isNullAt(idx)) {
        if (f.isMap) {
          val entry = msg.types(f.ptype)
          row.getMap[Any, Any](idx).foreach { case (k, v) =>
            val sub = new ByteArrayOutputStream()
            encodeMessage(sub, entry, Row(k, v), 0)
            writeLenDelim(out, f.number, sub.toByteArray)
          }
        } else if (f.repeated) {
          val xs = row.getSeq[Any](idx).filter(_ != null)
          if (xs.nonEmpty) f.ptype match {
            case "string" =>
              xs.foreach(x => writeLenDelim(out, f.number, x.asInstanceOf[String].getBytes("UTF-8")))
            case "bytes" =>
              xs.foreach(x => writeLenDelim(out, f.number, x.asInstanceOf[Array[Byte]]))
            case t if msg.types.contains(t) =>
              xs.foreach { x =>
                val sub = new ByteArrayOutputStream()
                encodeMessage(sub, msg.types(t), x.asInstanceOf[Row], 0)
                writeLenDelim(out, f.number, sub.toByteArray)
              }
            case _ => // packed numerics: the proto3 default encoding
              val sub = new ByteArrayOutputStream()
              xs.foreach(x => writePackedScalar(sub, f.ptype, x))
              writeLenDelim(out, f.number, sub.toByteArray)
          }
        } else msg.types.get(f.ptype) match {
          case Some(subMsg) =>
            val sub = new ByteArrayOutputStream()
            encodeMessage(sub, subMsg, row.getStruct(idx), 0)
            writeLenDelim(out, f.number, sub.toByteArray)
          case None => f.ptype match {
            case "string" => writeLenDelim(out, f.number, row.getString(idx).getBytes("UTF-8"))
            case "bytes" => writeLenDelim(out, f.number, row.getAs[Array[Byte]](idx))
            case t =>
              writeKey(out, f.number, wireOf(t))
              writePackedScalar(out, t, row.get(idx))
          }
        }
      }
      i += 1
    }
  }

  /** Encode `df`'s columns (matched by descriptor field NAME) into a
    * `proto` bytes column, keeping `keep` columns alongside. Typed kernel,
    * one pass. */
  def encode(df: DataFrame, msg: ProtoMessage, keep: Seq[String]): DataFrame = {
    val schema = sparkSchema(msg)
    val in = df.select(
      keep.map(col) ++
        msg.fields.map(f =>
          aligned(col(f.name), df.schema(f.name).dataType, schema(f.name).dataType).as(f.name)): _*)
    val outSchema = StructType(keep.map(in.schema(_)) :+ StructField("proto", BinaryType))
    val nKeep = keep.length
    in.mapPartitions { rows =>
      rows.map { row =>
        val out = new ByteArrayOutputStream()
        encodeMessage(out, msg, row, nKeep)
        Row.fromSeq((0 until nKeep).map(row.get) :+ out.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  private def scalarDefault(ptype: String): Any = ptype match {
    case "string" => ""
    case "bytes" => Array.emptyByteArray
    case "double" => 0.0
    case "float" => 0.0f
    case "bool" => false
    case _ => 0L
  }

  /** field number → index, for every message reachable from the root —
    * built once on the driver so the per-row decode loop does no schema
    * work. Message names are unique per descriptor (enforced at parse). */
  private def decodeTables(msg: ProtoMessage): Map[String, Map[Int, Int]] =
    msg.types.values.foldLeft(
      Map(msg.name -> msg.fields.zipWithIndex.map { case (f, i) => f.number -> i }.toMap)
    )((acc, sub) => acc ++ decodeTables(sub))

  /** Decode one message body b[start, end) to an external Row. */
  private def decodeMessage(msg: ProtoMessage, tables: Map[String, Map[Int, Int]],
      b: Array[Byte], start: Int, end: Int): Row = {
    val fields = msg.fields
    val values = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) { // proto3 defaults for absent fields
      val f = fields(i)
      values(i) =
        if (f.repeated || f.isMap) new scala.collection.mutable.ArrayBuffer[Any]()
        else if (msg.types.contains(f.ptype)) null // absent message = null struct
        else if (f.oneofGroup.isDefined) null // oneof members track presence
        else scalarDefault(f.ptype)
      i += 1
    }
    val byNumber = tables(msg.name)
    var p = start
    while (p < end) {
      val (key, p1) = readVarint(b, p)
      val wire = (key & 7).toInt
      byNumber.get((key >>> 3).toInt) match {
        case Some(idx) =>
          val f = fields(idx)
          // proto3 oneof: a successfully DECODED member clears its siblings
          // — only the last member on the wire survives. Cleared on set,
          // never on the skip path: a wire-type-mismatched occurrence is
          // unknown-field territory and must not destroy a sibling already
          // decoded (canonical parsers keep it).
          def clearSiblings(): Unit =
            msg.oneofSiblings.get(idx).foreach { sibs =>
              var s = 0
              while (s < sibs.length) { values(sibs(s)) = null; s += 1 }
            }
          def appendOrSet(v: Any): Unit =
            if (f.repeated || f.isMap) values(idx).asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]] += v
            else { clearSiblings(); values(idx) = v }
          val isMsg = msg.types.contains(f.ptype)
          (f.ptype, wire) match {
            case (t, 2) if isMsg =>
              val (len, p2) = readVarint(b, p1)
              if (f.repeated || f.isMap) // each occurrence is its own element/entry
                appendOrSet(decodeMessage(msg.types(t), tables, b, p2, p2 + len.toInt))
              else {
                // proto3 MERGES repeated occurrences of a singular embedded
                // message (concatenation = merge); accumulate the raw bytes
                // and decode once at the end — last-wins would silently
                // drop fields set only in earlier occurrences
                val buf = values(idx) match {
                  case s: ByteArrayOutputStream => s
                  case _ => // fresh start (incl. after a oneof switch-back)
                    clearSiblings()
                    val s = new ByteArrayOutputStream(); values(idx) = s; s
                }
                buf.write(b, p2, len.toInt)
              }
              p = p2 + len.toInt
            case ("string", 2) =>
              val (len, p2) = readVarint(b, p1)
              appendOrSet(new String(b, p2, len.toInt, "UTF-8")); p = p2 + len.toInt
            case ("bytes", 2) =>
              val (len, p2) = readVarint(b, p1)
              appendOrSet(java.util.Arrays.copyOfRange(b, p2, p2 + len.toInt)); p = p2 + len.toInt
            case (t, 2) if f.repeated => // packed numerics
              val (len, p2) = readVarint(b, p1)
              val stop = p2 + len.toInt
              var q = p2
              while (q < stop) {
                t match {
                  case "double" => appendOrSet(java.lang.Double.longBitsToDouble(readFixed64(b, q))); q += 8
                  case "float" =>
                    appendOrSet(java.lang.Float.intBitsToFloat(readFixed32(b, q))); q += 4
                  case "bool" => val (v, q2) = readVarint(b, q); appendOrSet(v != 0L); q = q2
                  case "sint32" | "sint64" =>
                    val (v, q2) = readVarint(b, q); appendOrSet(zigzagDecode(v)); q = q2
                  case _ => val (v, q2) = readVarint(b, q); appendOrSet(v); q = q2
                }
              }
              p = stop
            case ("double", 1) =>
              appendOrSet(java.lang.Double.longBitsToDouble(readFixed64(b, p1))); p = p1 + 8
            case ("float", 5) =>
              appendOrSet(java.lang.Float.intBitsToFloat(readFixed32(b, p1))); p = p1 + 4
            case ("bool", 0) =>
              val (v, p2) = readVarint(b, p1); appendOrSet(v != 0L); p = p2
            case ("sint32" | "sint64", 0) =>
              val (v, p2) = readVarint(b, p1); appendOrSet(zigzagDecode(v)); p = p2
            case ("int32" | "int64" | "uint32" | "uint64", 0) =>
              val (v, p2) = readVarint(b, p1); appendOrSet(v); p = p2
            // wire/descriptor type mismatch (e.g. writer sent a varint
            // where the descriptor says string): skip, keep the default —
            // storing the raw Long would kill the row encoder
            case _ => p = skip(b, p1, wire)
          }
        case None => p = skip(b, p1, wire)
      }
    }
    var r = 0
    while (r < fields.length) {
      values(r) = values(r) match {
        case ab: scala.collection.mutable.ArrayBuffer[_] =>
          if (fields(r).isMap) // entry rows → Map; toMap keeps the LAST
            ab.map { case e: Row => e.get(0) -> e.get(1) }.toMap // duplicate key (proto3)
          else ab.toSeq
        case s: ByteArrayOutputStream => // merged singular-message bytes
          val bb = s.toByteArray
          decodeMessage(msg.types(fields(r).ptype), tables, bb, 0, bb.length)
        case v => v
      }
      r += 1
    }
    Row.fromSeq(values.toIndexedSeq)
  }

  /** Decode a bytes column through the descriptor: one output column per
    * descriptor field (absent fields → proto3 defaults, absent messages →
    * null), `keep` columns passed through, unknown field numbers skipped
    * by wire type.
    *
    * Corrupt-input posture (round 13, the media-decoder rule applied to
    * serde): a record whose bytes cannot be structurally decoded —
    * truncated varint, length running past the buffer, negative length —
    * yields ALL-NULL decoded columns instead of throwing. An exception in
    * this kernel would kill a 100 TB task, get retried, and kill it
    * again; corrupt records are normal input at scrape scale. All-null is
    * distinguishable from every legal decode (absent fields decode to
    * proto3 DEFAULTS, not null), so callers can filter on it. */
  def decode(df: DataFrame, binCol: String, msg: ProtoMessage, keep: Seq[String] = Nil): DataFrame = {
    val valueSchema = sparkSchema(msg)
    val in = df.select(keep.map(col) :+ col(binCol).cast("binary"): _*)
    val outSchema = StructType(keep.map(in.schema(_)) ++ valueSchema.fields)
    val nKeep = keep.length
    val nFields = msg.fields.length
    val tables = decodeTables(msg)
    in.mapPartitions { rows =>
      rows.map { row =>
        val b = row.getAs[Array[Byte]](nKeep)
        val decoded =
          try { if (b == null) null else decodeMessage(msg, tables, b, 0, b.length) }
          catch { case scala.util.control.NonFatal(_) => null }
        val vals: Seq[Any] =
          if (decoded == null) Seq.fill[Any](nFields)(null) else decoded.toSeq
        Row.fromSeq((0 until nKeep).map(row.get) ++ vals)
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
        // corrupt bytes → null-ish row, never a task-killing throw (the
        // descriptor path's posture; see ProtoWire.decode)
        try {
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
        } catch {
          case scala.util.control.NonFatal(_) => (0L, null: String, 0.0)
        }
      })
      .toDF("event_id", "event_type", "value")
  }
}
