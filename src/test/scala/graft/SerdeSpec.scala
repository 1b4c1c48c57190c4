package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.Helpers
import graft.serde.{Chunker, Serde}

/** Property tests for the serde layer: roundtrips hold for arbitrary
  * payloads, not just the driver corpus. */
class SerdeSpec extends SparkSpec {

  import spark.implicits._

  test("chunk/dechunk roundtrips arbitrary strings at multiple chunk sizes") {
    val texts = Gen.listOfN(30, Gen.asciiPrintableStr).sample.get
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "value")
    for (size <- Seq(1, 7, 64)) {
      val back = Chunker.dechunk(Chunker.chunk(df, size, Seq("doc_id")))
        .select("doc_id", "value").as[(Long, String)].collect().toMap
      texts.foreach { case (id, t) => assert(back(id) == t, s"size=$size id=$id") }
    }
  }

  test("chunkEnvelope preserves user headers and restores them on dechunk") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val hdrT = ArrayType(StructType(Seq(
      StructField("key", StringType), StructField("value", BinaryType))))
    val schema = StructType(Seq(
      StructField("key", StringType), StructField("value", StringType),
      StructField("headers", hdrT)))
    val rows = java.util.Arrays.asList(
      Row("k_a", "x" * 25, Seq(Row("trace", "t-1".getBytes("UTF-8")))),
      Row("k_b", "y" * 5, null)) // null headers must not NPE the concat
    val env = spark.createDataFrame(rows, schema)
    val chunked = Chunker.chunkEnvelope(env, chunkChars = 10, idCols = Seq("key"))
    // every chunk carries the user header FOLLOWED BY the chunk entries
    val hk = chunked.select(expr("transform(headers, x -> x.key)").as("ks"))
      .where(col("key").startsWith("k_a"))
      .as[Seq[String]].collect()
    assert(hk.nonEmpty && hk.forall(_ == Seq("trace", "chunk_id", "chunk_seq", "chunk_total")))
    val back = Chunker.dechunkEnvelope(chunked)
    val backHdrs = back.select(col("key"), expr("transform(headers, x -> (x.key, cast(x.value as string)))").as("h"))
      .as[(String, Seq[(String, String)])].collect().toMap
    // keys with '_' survive the last-'_' suffix strip; chunk metadata gone
    assert(backHdrs.keySet == Set("k_a", "k_b"))
    assert(backHdrs("k_a") == Seq(("trace", "t-1")))
    assert(backHdrs("k_b") == Seq.empty)
    val vals = back.select("key", "value").as[(String, String)].collect().toMap
    assert(vals("k_a") == "x" * 25 && vals("k_b") == "y" * 5)
  }

  test("chunk key suffix widens past 6 digits (no collision at seq >= 1e6)") {
    // don't materialize 1e6 chunks: check the key arithmetic directly on
    // the same expressions chunkEnvelope uses
    val suffix = spark.range(1).select(
      format_string("_%06d", lit(100000)).as("a"),
      format_string("_%06d", lit(1000000)).as("b"),
      format_string("_%06d", lit(10000001)).as("c")).head()
    assert(suffix.getString(0) == "_100000")
    assert(suffix.getString(1) == "_1000000") // lpad would truncate to _100000
    assert(suffix.getString(2) == "_10000001")
    val stripped = spark.createDataset(Seq("k_1_0100000", "k_1_1000000", "base_10000001"))
      .toDF("key")
      .select(expr(
        "substring(key, 1, length(key) - length(substring_index(key, '_', -1)) - 1)").as("k"))
      .as[String].collect().toSeq
    assert(stripped == Seq("k_1", "k_1", "base"))
  }

  test("confluent wire format roundtrips arbitrary schema ids incl. boundaries") {
    val ids = Seq(0, 1, 127, 128, 255, 256, 65535, 1 << 24, Int.MaxValue)
    val df = ids.zipWithIndex.map { case (sid, i) => (i.toLong, s"payload-$i", sid) }
      .toDF("id", "payload", "sid")
    val framed = df.withColumn("bin",
      Serde.confluentWrap(Serde.utf8Encode(col("payload")), col("sid")))
    val back = framed.select(
      col("id"),
      Serde.confluentSchemaId(col("bin")).as("sid2"),
      Serde.utf8Decode(Serde.confluentBody(col("bin"))).as("p2"))
      .as[(Long, Int, String)].collect()
    back.foreach { case (i, sid2, p2) =>
      assert(sid2 == ids(i.toInt), s"schema id mismatch at $i")
      assert(p2 == s"payload-$i")
    }
  }

  test("schema-id discovery: header GUID wins over the wire prefix, absent falls back") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val uuid = java.util.UUID.fromString("3e2f0680-1234-4abc-8def-00c0ffee0042")
    val bb = java.nio.ByteBuffer.allocate(17)
    bb.put(1.toByte) // version byte, skipped by the extractor
    bb.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    val hdrT = ArrayType(StructType(Seq(
      StructField("key", StringType), StructField("value", BinaryType))))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("bin", BinaryType), StructField("headers", hdrT)))
    val framedBytes = Array[Byte](0, 0, 0, 0, 42) ++ "payload".getBytes("UTF-8")
    val rows = java.util.Arrays.asList(
      Row(1L, framedBytes, Seq(Row("__value_schema_id", bb.array()),
        Row("other", "x".getBytes("UTF-8")))),
      Row(2L, framedBytes, Seq(Row("other", "x".getBytes("UTF-8")))),
      Row(3L, framedBytes, null))
    val df = spark.createDataFrame(rows, schema)
    val refs = df.select(col("id"),
        Serde.schemaRef(col("bin"), col("headers"), isKey = false).as("r"))
      .as[(Long, String)].collect().toMap
    assert(refs(1L) == uuid.toString, "header GUID must take precedence")
    assert(refs(2L) == "42" && refs(3L) == "42", "no header -> wire-prefix id")
    // key-side header name is independent of the value-side one
    val keyRef = df.where(col("id") === 1)
      .select(Serde.schemaRef(col("bin"), col("headers"), isKey = true))
      .head().getString(0)
    assert(keyRef == "42", "__value_schema_id must not satisfy the KEY lookup")
    // resolveSchema routes GUIDs and integer ids to the right registry call
    val sr = new graft.serde.SchemaRegistry("http://unused") {
      override def schemaById(id: Int): String = s"by-id:$id"
      override def schemaByGuid(guid: String): String = s"by-guid:$guid"
    }
    assert(Serde.resolveSchema(sr, refs(1L)) == s"by-guid:$uuid")
    assert(Serde.resolveSchema(sr, refs(2L)) == "by-id:42")
  }

  test("zstd roundtrips and compresses repetitive payloads") {
    val payload = ("the quick brown fox " * 500).getBytes("UTF-8")
    val compressed = Helpers.zstdCompress(payload)
    assert(compressed.length < payload.length / 5)
    assert(Helpers.zstdDecompress(compressed).sameElements(payload))
  }

  test("glob matching mirrors the reference's pattern semantics") {
    assert(Helpers.globMatch("snacks", "sn*"))
    assert(Helpers.globMatch("snacks", "s?acks"))
    assert(!Helpers.globMatch("snacks", "sn"))
    assert(Helpers.globMatch("a.b", "a.b") && !Helpers.globMatch("axb", "a.b"))
  }

  test("json path get over payload and struct forms agree") {
    val df = Seq((1L, """{"a": {"b": 7}}""")).toDF("id", "payload")
      .withColumn("parsed", from_json(col("payload"), org.apache.spark.sql.types.StructType.fromDDL("a STRUCT<b: INT>")))
    val row = df.select(
      Helpers.jsonPathGet(col("payload"), "a.b").cast("int").as("viaJson"),
      Helpers.structPathGet(col("parsed"), "a.b").as("viaStruct")).head
    assert(row.getInt(0) == 7 && row.getInt(1) == 7)
  }

  test("avro decode emits real Avro JSON: nullable unions and bytes roundtrip") {
    val schema =
      """{"type":"record","name":"R","fields":[
        |{"name":"s","type":["null","string"],"default":null},
        |{"name":"n","type":["null","long"],"default":null},
        |{"name":"b","type":"bytes"}]}""".stripMargin
    // Avro-JSON form: union values carry their branch wrapper, bytes use
    // ISO-8859-1 escapes — exactly what jsonDecoder needs on re-encode.
    val rows = Seq(
      (1L, """{"s":{"string":"héllo"},"n":null,"b":"ÿA"}"""), // ÿ = byte 0xFF
      (2L, """{"s":null,"n":{"long":42},"b":""}"""))
    val df = rows.toDF("id", "json")
    val bin = graft.serde.AvroSerde.encodeFromJson(df, "id", "json", schema)
    val back = graft.serde.AvroSerde.decodeToJson(bin, "id", "avro", schema)
    // the documented decode->encode roundtrip (fails with GenericRecord.toString)
    val bin2 = graft.serde.AvroSerde.encodeFromJson(back, "id", "json", schema)
    val b1 = bin.as[(Long, Array[Byte])].collect().toMap
    val b2 = bin2.as[(Long, Array[Byte])].collect().toMap
    rows.foreach { case (id, _) =>
      assert(b1(id).sameElements(b2(id)), s"binary drift after JSON roundtrip for id=$id")
    }
  }

  test("json schema compiles to StructType: nesting, unions, required nullability") {
    import graft.serde.JsonSchema
    import org.apache.spark.sql.types._
    val schema =
      """{"type":"object",
        |"properties":{
        |  "id":{"type":"integer"},
        |  "score":{"type":"number"},
        |  "ok":{"type":"boolean"},
        |  "tags":{"type":"array","items":{"type":"string"}},
        |  "meta":{"type":"object","properties":{"k":{"type":"string"}},"required":["k"]},
        |  "opt":{"type":["string","null"]}},
        |"required":["id","tags"]}""".stripMargin
    val st = JsonSchema.toStruct(schema)
    assert(st("id") == StructField("id", LongType, nullable = false))
    assert(st("score").dataType == DoubleType && st("score").nullable)
    assert(st("ok").dataType == BooleanType)
    assert(st("tags") == StructField("tags", ArrayType(StringType), nullable = false))
    assert(st("meta").dataType == StructType(Seq(StructField("k", StringType, nullable = false))))
    assert(st("opt") == StructField("opt", StringType, nullable = true))
    assert(JsonSchema.required(schema) == Seq("id", "tags"))
  }

  test("json schema validation flags malformed, missing-required, and null-required payloads") {
    import graft.serde.JsonSchema
    val schema =
      """{"type":"object","properties":{"id":{"type":"integer"},"text":{"type":"string"}},
        |"required":["id","text"]}""".stripMargin
    val rows = Seq(
      (1L, """{"id":1,"text":"ok"}"""),      // valid
      (2L, """{"id":2}"""),                  // missing required text
      (3L, """{"id":null,"text":"x"}"""),    // required field JSON-null
      (4L, """not json at all"""),           // malformed
      (5L, """{"id":5,"text":null}"""))      // required field JSON-null
    val df = rows.toDF("rid", "payload")
    val got = df.select(col("rid"),
        JsonSchema.isValid(col("payload"), schema).as("valid"),
        JsonSchema.error(col("payload"), schema).as("error"))
      .as[(Long, Boolean, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, true, null),
      (2L, false, "missing:text"),
      (3L, false, "missing:id"),
      (4L, false, "malformed"),
      (5L, false, "missing:text")))
    // decode never throws and preserves what it can
    val dec = df.select(col("rid"),
        JsonSchema.decode(col("payload"), schema).getField("text").as("t"))
      .as[(Long, String)].collect().toMap
    assert(dec(1L) == "ok" && dec(2L) == null && dec(4L) == null)
  }

  test("json schema required names containing dots resolve as one segment") {
    import graft.serde.JsonSchema
    val schema =
      """{"type":"object","properties":{"a.b":{"type":"integer"}},"required":["a.b"]}"""
    val got = Seq((1L, """{"a.b":1}"""), (2L, """{"a":{"b":1}}"""))
      .toDF("rid", "p")
      .select(col("rid"),
        JsonSchema.isValid(col("p"), schema).as("v"),
        JsonSchema.error(col("p"), schema).as("e"))
      .as[(Long, Boolean, String)].collect().sortBy(_._1)
    // {"a.b":1} satisfies the schema; a NESTED {"a":{"b":1}} does not —
    // a naive $.a.b path would get these exactly backwards
    assert(got.toSeq == Seq((1L, true, null), (2L, false, "missing:a.b")))
  }

  test("json schema non-object roots decode and validate (reference's no-dict key case)") {
    import graft.serde.JsonSchema
    // the reference produces jsonschema payloads with scalar root schemas
    // (test_single_storage_base.py test_produce_consume_jsonschema_no_dict_key)
    val strRoot = """{"type":"string"}"""
    val intRoot = """{"type":"integer"}"""
    val got = Seq(
      (1L, "\"snack\"", "7"), (2L, "12", "\"abc\""), (3L, "{bad", "{bad"))
      .toDF("rid", "ps", "pi")
      .select(col("rid"),
        JsonSchema.decode(col("ps"), strRoot).as("s"),
        JsonSchema.isValid(col("ps"), strRoot).as("sv"),
        JsonSchema.decode(col("pi"), intRoot).as("i"),
        JsonSchema.isValid(col("pi"), intRoot).as("iv"),
        JsonSchema.error(col("pi"), intRoot).as("ie"))
      .collect().sortBy(_.getLong(0))
    assert(got(0).getString(1) == "snack" && got(0).getBoolean(2))
    assert(got(0).getLong(3) == 7L && got(0).getBoolean(4) && got(0).isNullAt(5))
    // a JSON string against an integer root fails to coerce -> invalid
    assert(!got(1).getBoolean(4) && got(1).getString(5) == "malformed")
    // a bare number against a STRING root is invalid (the reference's
    // validator rejects 12 against type:string; Jackson would stringify it)
    assert(got(1).isNullAt(1) && !got(1).getBoolean(2))
    assert(got(2).isNullAt(1) && !got(2).getBoolean(2) && !got(2).getBoolean(4))
  }

  test("json schema scalar root rejects injection payloads and partial JSON") {
    import graft.serde.JsonSchema
    val intRoot = """{"type":"integer"}"""
    // '1,"v":2' is NOT standalone JSON but completes the decode wrapper
    // into {"v":1,"v":2} (last duplicate wins) — must stay malformed
    val got = Seq((1L, """1,"v":2"""), (2L, "3"))
      .toDF("rid", "p")
      .select(col("rid"),
        JsonSchema.decode(col("p"), intRoot).as("v"),
        JsonSchema.isValid(col("p"), intRoot).as("ok"),
        JsonSchema.error(col("p"), intRoot).as("e"))
      .collect().sortBy(_.getLong(0))
    assert(got(0).isNullAt(1) && !got(0).getBoolean(2) && got(0).getString(3) == "malformed",
      s"injection payload must be malformed, got ${got(0)}")
    assert(got(1).getLong(1) == 3L && got(1).getBoolean(2) && got(1).isNullAt(3))
  }

  test("json schema array root rejects a lone object payload") {
    import graft.serde.JsonSchema
    val arrRoot = """{"type":"array","items":{"type":"integer"}}"""
    val got = Seq((1L, "[1,2]"), (2L, """{"a":1}"""), (3L, "[bad"))
      .toDF("rid", "p")
      .select(col("rid"),
        JsonSchema.decode(col("p"), arrRoot).as("v"),
        JsonSchema.isValid(col("p"), arrRoot).as("ok"))
      .collect().sortBy(_.getLong(0))
    assert(got(0).getSeq[Long](1) == Seq(1L, 2L) && got(0).getBoolean(2))
    // from_json would silently wrap the object into a 1-element array
    assert(got(1).isNullAt(1) && !got(1).getBoolean(2))
    assert(got(2).isNullAt(1) && !got(2).getBoolean(2))
  }

  test("json schema property names Spark's JSONPath cannot address are rejected at compile") {
    import graft.serde.JsonSchema
    // Spark's bracket grammar is [^'?]+ with NO escaping: silently building
    // $['it\'s'] would flag every row missing; fail loudly instead
    val schema =
      """{"type":"object","properties":{"it's":{"type":"integer"}},"required":["it's"]}"""
    val e = intercept[IllegalArgumentException] {
      JsonSchema.isValid(col("p"), schema)
    }
    assert(e.getMessage.contains("it's"))
  }

  test("json schema nested required: conditional on parent presence, any depth") {
    import graft.serde.JsonSchema
    val schema =
      """{"type":"object","properties":{
        |"id":{"type":"integer"},
        |"meta":{"type":"object","properties":{
        |  "src":{"type":"string"},
        |  "inner":{"type":"object","properties":{"k":{"type":"integer"}},"required":["k"]}},
        |  "required":["src"]}},
        |"required":["id"]}""".stripMargin
    assert(JsonSchema.requiredPaths(schema) ==
      Seq(("", "id"), ("meta", "meta.src"), ("meta.inner", "meta.inner.k")))
    val rows = Seq(
      (1L, """{"id":1}"""),                                      // meta absent: fine
      (2L, """{"id":2,"meta":{"src":"s"}}"""),                   // inner absent: fine
      (3L, """{"id":3,"meta":{"x":1}}"""),                       // meta present, src missing
      (4L, """{"id":4,"meta":{"src":"s","inner":{}}}"""),        // inner present, k missing
      (5L, """{"meta":{"src":"s"}}"""))                          // root required missing
    val got = rows.toDF("rid", "p").select(col("rid"),
        JsonSchema.isValid(col("p"), schema).as("v"),
        JsonSchema.error(col("p"), schema).as("e"))
      .as[(Long, Boolean, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, true, null), (2L, true, null),
      (3L, false, "missing:meta.src"),
      (4L, false, "missing:meta.inner.k"),
      (5L, false, "missing:id")))
  }

  test("proto wire varint roundtrips boundary values") {
    import graft.serde.ProtoWire
    val values = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, Int.MaxValue.toLong,
      (1L << 32) - 1, (1L << 56) + 17, Long.MaxValue, -1L, Long.MinValue)
    values.foreach { v =>
      val out = new java.io.ByteArrayOutputStream()
      ProtoWire.writeVarint(out, v)
      val bytes = out.toByteArray
      assert(bytes.length <= 10, s"varint for $v too long")
      val (back, next) = ProtoWire.readVarint(bytes, 0)
      assert(back == v, s"varint roundtrip failed for $v")
      assert(next == bytes.length)
    }
  }

  test("proto wire varint rejects overlong and truncated input") {
    import graft.serde.ProtoWire
    // 11 continuation bytes: a conforming decoder must fail, not wrap the
    // shift mod 64 and fold high bits into low positions
    val overlong = Array.fill[Byte](11)(0x80.toByte) :+ 0x01.toByte
    intercept[IllegalArgumentException](ProtoWire.readVarint(overlong, 0))
    // continuation bit set on the last available byte: truncated
    val truncated = Array[Byte](0x80.toByte, 0x80.toByte)
    intercept[IllegalArgumentException](ProtoWire.readVarint(truncated, 0))
    // a full 10-byte varint (-1L) still decodes
    val out = new java.io.ByteArrayOutputStream()
    ProtoWire.writeVarint(out, -1L)
    assert(out.toByteArray.length == 10)
    assert(ProtoWire.readVarint(out.toByteArray, 0)._1 == -1L)
  }

  test("descriptor-driven proto roundtrips all scalar types incl. zigzag and float") {
    import graft.serde.ProtoWire
    val msg = ProtoWire.parseDescriptor(
      """// flat scalar coverage
        |syntax = "proto3";
        |message All {
        |  int64 a = 1;
        |  sint64 b = 2;
        |  bool c = 3;
        |  double d = 4;
        |  float e = 5;
        |  string f = 6;
        |  bytes g = 7;
        |}""".stripMargin)
    assert(msg.name == "All" && msg.fields.map(_.number) == Seq(1, 2, 3, 4, 5, 6, 7))
    val df = Seq(
      (1L, Long.MinValue, true, 3.5, 1.25f, "héllo✓", Array[Byte](0, -1, 127)),
      (2L, -1L, false, -0.0, Float.NaN, "", Array.emptyByteArray))
      .toDF("a", "b", "c", "d", "e", "f", "g")
    val back = ProtoWire.decode(ProtoWire.encode(df, msg, keep = Nil), "proto", msg)
      .as[(Long, Long, Boolean, Double, Float, String, Array[Byte])]
      .collect().sortBy(_._1)
    val exp = df.as[(Long, Long, Boolean, Double, Float, String, Array[Byte])]
      .collect().sortBy(_._1)
    back.zip(exp).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3)
      assert(java.lang.Double.doubleToLongBits(g._4) == java.lang.Double.doubleToLongBits(e._4))
      assert(java.lang.Float.floatToIntBits(g._5) == java.lang.Float.floatToIntBits(e._5))
      assert(g._6 == e._6 && g._7.sameElements(e._7))
    }
  }

  test("descriptor decode: absent fields default, foreign fields skip, nulls omitted") {
    import graft.serde.ProtoWire
    val wide = ProtoWire.parseDescriptor(
      "message W { int64 id = 1; string s = 2; double d = 3; }")
    val narrow = ProtoWire.parseDescriptor(
      "message N { int64 id = 1; bool flag = 9; }")
    // encode with the wide descriptor, decode with the narrow one: field 1
    // matches, 2/3 are unknown (skipped by wire type), 9 absent → false
    val df = Seq((7L, "x", 2.5)).toDF("id", "s", "d")
    val got = ProtoWire.decode(ProtoWire.encode(df, wide, keep = Nil), "proto", narrow)
      .as[(Long, Boolean)].head()
    assert(got == ((7L, false)))
    // a null column is omitted from the wire → decodes to proto3 default
    val withNull = Seq((8L, Option.empty[String], Option.empty[Double]))
      .toDF("id", "s", "d")
    val back = ProtoWire.decode(ProtoWire.encode(withNull, wide, keep = Nil), "proto", wide)
      .as[(Long, String, Double)].head()
    assert(back == ((8L, "", 0.0)))
    // keep columns pass through both directions
    val kept = ProtoWire.decode(
      ProtoWire.encode(df.withColumn("tag", lit("k")), wide, keep = Seq("tag")),
      "proto", wide, keep = Seq("tag"))
    assert(kept.columns.toSeq == Seq("tag", "id", "s", "d"))
    assert(kept.select("tag").head().getString(0) == "k")
  }

  test("descriptor codec roundtrips generated values across all scalar types") {
    import graft.serde.ProtoWire
    import org.scalacheck.Arbitrary.arbitrary
    val msg = ProtoWire.parseDescriptor(
      "message P { int64 a = 1; sint64 b = 2; double d = 3; string s = 4; bytes g = 5; bool c = 6; }")
    // BMP-only strings: lone surrogates don't survive UTF-8 by design
    val bmpStr = Gen.listOf(Gen.choose(32, 0xD7FF).map(_.toChar)).map(_.mkString)
    val rowGen = for {
      a <- arbitrary[Long]; b <- arbitrary[Long]; d <- arbitrary[Double]
      s <- bmpStr; g <- arbitrary[Array[Byte]]; c <- arbitrary[Boolean]
    } yield (a, b, d, s, g, c)
    val rows = Gen.listOfN(200, rowGen).sample.get.zipWithIndex
      .map { case ((a, b, d, s, g, c), i) => (i.toLong, a, b, d, s, g, c) }
    val df = rows.toDF("rid", "a", "b", "d", "s", "g", "c")
    val back = ProtoWire.decode(
        ProtoWire.encode(df, msg, keep = Seq("rid")), "proto", msg, keep = Seq("rid"))
      .as[(Long, Long, Long, Double, String, Array[Byte], Boolean)]
      .collect().sortBy(_._1)
    assert(back.length == rows.length)
    rows.sortBy(_._1).zip(back).foreach { case (e, g2) =>
      assert(e._2 == g2._2 && e._3 == g2._3, s"long/sint drift at rid=${e._1}")
      assert(java.lang.Double.doubleToLongBits(e._4) == java.lang.Double.doubleToLongBits(g2._4),
        s"double drift at rid=${e._1}")
      assert(e._5 == g2._5, s"string drift at rid=${e._1}")
      assert(e._6.sameElements(g2._6), s"bytes drift at rid=${e._1}")
      assert(e._7 == g2._7)
    }
  }

  test("descriptor codec roundtrips generated maps and oneof values") {
    import graft.serde.ProtoWire
    import org.scalacheck.Arbitrary.arbitrary
    val msg = ProtoWire.parseDescriptor(
      "message PM { int64 rid = 1; map<string, int64> kv = 2; oneof o { string sv = 3; sint64 nv = 4; } }")
    val bmpKey = Gen.nonEmptyListOf(Gen.choose(32, 0xD7FF).map(_.toChar)).map(_.mkString)
    val rowGen = for {
      kv <- Gen.mapOf(Gen.zip(bmpKey, arbitrary[Long]))
      pick <- arbitrary[Boolean]
      sv <- bmpKey; nv <- arbitrary[Long]
    } yield (kv, if (pick) Some(sv) else None, if (pick) None else Some(nv))
    val rows = Gen.listOfN(120, rowGen).sample.get.zipWithIndex
      .map { case ((kv, sv, nv), i) => (i.toLong, kv, sv, nv) }
    val df = rows.toDF("rid", "kv", "sv", "nv")
    val back = ProtoWire.decode(
        ProtoWire.encode(df, msg, keep = Nil), "proto", msg)
      .as[(Long, Map[String, Long], Option[String], Option[Long])]
      .collect().sortBy(_._1)
    assert(back.length == rows.length)
    rows.sortBy(_._1).zip(back).foreach { case (e, g2) =>
      assert(e._2 == g2._2, s"map drift at rid=${e._1}")
      assert(e._3 == g2._3 && e._4 == g2._4, s"oneof drift at rid=${e._1}")
    }
  }

  test("descriptor parse rejects recursion/bad maps; wire-type mismatch skips, not crashes") {
    import graft.serde.ProtoWire
    // float map keys are not legal proto
    intercept[IllegalArgumentException](
      ProtoWire.parseDescriptor("message M { map<double, int64> kv = 1; }"))
    // repeated inside oneof is not legal proto
    intercept[IllegalArgumentException](
      ProtoWire.parseDescriptor("message M { oneof choice { repeated int64 a = 1; } }"))
    // recursion has no finite Spark schema: rejected, not an infinite loop
    intercept[IllegalArgumentException](
      ProtoWire.parseDescriptor("message M { M next = 1; }"))
    intercept[IllegalArgumentException](ProtoWire.parseDescriptor(
      "message A { B b = 1; } message B { A a = 1; }"))
    // optional is wire-identical to singular: accepted
    assert(ProtoWire.parseDescriptor("message M { optional int64 a = 1; }").fields.head.name == "a")
    // writer says int64, reader's descriptor says double for the same field
    // number: the varint must be SKIPPED (default 0.0), not stored as a Long
    val asLong = ProtoWire.parseDescriptor("message M { int64 x = 1; string s = 2; }")
    val asDouble = ProtoWire.parseDescriptor("message M { double x = 1; string s = 2; }")
    val df = Seq((42L, "keep")).toDF("x", "s")
    val got = ProtoWire.decode(ProtoWire.encode(df, asLong, keep = Nil), "proto", asDouble)
      .as[(Double, String)].head()
    assert(got == ((0.0, "keep")))
  }

  test("descriptor codec: nested messages and repeated fields roundtrip") {
    import graft.serde.ProtoWire
    import org.apache.spark.sql.types._
    val msg = ProtoWire.parseDescriptor(
      """syntax = "proto3";
        |message Doc {
        |  int64 id = 1;
        |  Meta meta = 2;               // nested-by-reference
        |  repeated string tags = 3;    // unpacked per-element
        |  repeated int64 scores = 4;   // packed numerics
        |  repeated Meta history = 5;   // repeated message
        |  message Meta {               // nested definition also allowed
        |    string src = 1;
        |    sint64 rank = 2;
        |  }
        |}""".stripMargin)
    assert(ProtoWire.sparkSchema(msg) == StructType(Seq(
      StructField("id", LongType),
      StructField("meta", StructType(Seq(
        StructField("src", StringType), StructField("rank", LongType)))),
      StructField("tags", ArrayType(StringType)),
      StructField("scores", ArrayType(LongType)),
      StructField("history", ArrayType(StructType(Seq(
        StructField("src", StringType), StructField("rank", LongType))))))))
    val df = Seq(
      (1L, ("s1", -5L), Seq("a", "b"), Seq(1L, -2L, Long.MaxValue), Seq(("h1", 1L), ("h2", 2L))),
      (2L, ("", 0L), Seq.empty[String], Seq.empty[Long], Seq.empty[(String, Long)]))
      .toDF("id", "meta0", "tags", "scores", "history0")
      // struct fields are matched by NAME (tuple _1/_2 names would be
      // rejected — that strictness is the point of the aligned cast)
      .select(col("id"),
        struct(col("meta0._1").as("src"), col("meta0._2").as("rank")).as("meta"),
        col("tags"), col("scores"),
        transform(col("history0"),
          x => struct(x.getField("_1").as("src"), x.getField("_2").as("rank"))).as("history"))
    val back = ProtoWire.decode(ProtoWire.encode(df, msg, keep = Nil), "proto", msg)
      .as[(Long, (String, Long), Seq[String], Seq[Long], Seq[(String, Long)])]
      .collect().sortBy(_._1)
    assert(back(0) == ((1L, ("s1", -5L), Seq("a", "b"), Seq(1L, -2L, Long.MaxValue),
      Seq(("h1", 1L), ("h2", 2L)))))
    // empty repeated fields are omitted on the wire and decode back empty;
    // an all-default nested message still roundtrips as a present struct?
    // no — proto3 cannot distinguish an all-default message from absent
    // UNLESS it serializes non-default content; ("", 0) encodes zero bytes
    // with a present key
    assert(back(1)._1 == 2L && back(1)._3.isEmpty && back(1)._4.isEmpty && back(1)._5.isEmpty)
    assert(back(1)._2 == (("", 0L))) // present (empty) submessage → defaults
    // unpacked repeated numerics also decode (spec: parsers accept both)
    val unpacked = {
      val out = new java.io.ByteArrayOutputStream()
      ProtoWire.writeVarint(out, (1L << 3) | 0); ProtoWire.writeVarint(out, 9L)
      ProtoWire.writeVarint(out, (4L << 3) | 0); ProtoWire.writeVarint(out, 7L)
      ProtoWire.writeVarint(out, (4L << 3) | 0); ProtoWire.writeVarint(out, 8L)
      out.toByteArray
    }
    val got = ProtoWire.decode(Seq(Tuple1(unpacked)).toDF("proto"), "proto", msg)
      .select("id", "scores").as[(Long, Seq[Long])].head()
    assert(got == ((9L, Seq(7L, 8L))))
  }

  test("map<K,V> fields roundtrip as MapType; duplicate wire keys keep the last") {
    import graft.serde.ProtoWire
    val msg = ProtoWire.parseDescriptor(
      "message M { int64 id = 1; map<string, int64> kv = 2; }")
    assert(ProtoWire.sparkSchema(msg)("kv").dataType ==
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType))
    val df = Seq((1L, Map("a" -> 10L, "b" -> 20L)), (2L, Map.empty[String, Long]))
      .toDF("id", "kv")
    val back = ProtoWire.decode(ProtoWire.encode(df, msg, keep = Nil), "proto", msg)
      .as[(Long, Map[String, Long])].collect().sortBy(_._1)
    assert(back.toSeq == Seq((1L, Map("a" -> 10L, "b" -> 20L)), (2L, Map.empty[String, Long])))
    // duplicate key on the wire: proto3 keeps the LAST entry
    val entry1 = new java.io.ByteArrayOutputStream() // {key:"a", value:1}
    ProtoWire.writeVarint(entry1, (1L << 3) | 2); ProtoWire.writeVarint(entry1, 1L); entry1.write('a')
    ProtoWire.writeVarint(entry1, (2L << 3) | 0); ProtoWire.writeVarint(entry1, 1L)
    val entry2 = new java.io.ByteArrayOutputStream() // {key:"a", value:9}
    ProtoWire.writeVarint(entry2, (1L << 3) | 2); ProtoWire.writeVarint(entry2, 1L); entry2.write('a')
    ProtoWire.writeVarint(entry2, (2L << 3) | 0); ProtoWire.writeVarint(entry2, 9L)
    val wire = new java.io.ByteArrayOutputStream()
    for (e <- Seq(entry1, entry2)) {
      ProtoWire.writeVarint(wire, (2L << 3) | 2)
      ProtoWire.writeVarint(wire, e.size().toLong)
      wire.write(e.toByteArray)
    }
    val dup = ProtoWire.decode(Seq(Tuple1(wire.toByteArray)).toDF("proto"), "proto", msg)
      .select("kv").as[Map[String, Long]].head()
    assert(dup == Map("a" -> 9L), s"last duplicate key must win, got $dup")
  }

  test("proto2 required label and oneof parse; oneof decodes last-member-wins") {
    import graft.serde.ProtoWire
    // the reference's OWN test schema shape (test_single_storage_base.py:51):
    // proto2 required/optional labels must parse
    val snack = ProtoWire.parseDescriptor(
      "message snack_value { required string name = 1; required float calories = 2; optional string colour = 3; }")
    assert(snack.fields.map(_.name) == Seq("name", "calories", "colour"))
    val msg = ProtoWire.parseDescriptor(
      "message E { int64 id = 1; oneof body { string text = 2; int64 code = 3; } }")
    assert(msg.fields.map(_.name) == Seq("id", "text", "code"))
    // wire with BOTH members: text then code — only the last survives, and
    // the unset member is NULL (oneof tracks presence), not ""
    val out = new java.io.ByteArrayOutputStream()
    ProtoWire.writeVarint(out, (1L << 3) | 0); ProtoWire.writeVarint(out, 5L)
    ProtoWire.writeVarint(out, (2L << 3) | 2); ProtoWire.writeVarint(out, 2L)
    out.write('h'); out.write('i')
    ProtoWire.writeVarint(out, (3L << 3) | 0); ProtoWire.writeVarint(out, 42L)
    val got = ProtoWire.decode(Seq(Tuple1(out.toByteArray)).toDF("proto"), "proto", msg)
      .select("id", "text", "code").collect().head
    assert(got.getLong(0) == 5L && got.isNullAt(1) && got.getLong(2) == 42L,
      s"last oneof member must win with null siblings, got $got")
    // only the first member: code stays null, text present
    val out2 = new java.io.ByteArrayOutputStream()
    ProtoWire.writeVarint(out2, (2L << 3) | 2); ProtoWire.writeVarint(out2, 2L)
    out2.write('h'); out2.write('i')
    val got2 = ProtoWire.decode(Seq(Tuple1(out2.toByteArray)).toDF("proto"), "proto", msg)
      .select("id", "text", "code").collect().head
    assert(got2.getLong(0) == 0L && got2.getString(1) == "hi" && got2.isNullAt(2))
    // a wire-type-MISMATCHED sibling occurrence (skipped as unknown) must
    // NOT clear a member already decoded — canonical parsers keep "hi"
    val out3 = new java.io.ByteArrayOutputStream()
    ProtoWire.writeVarint(out3, (2L << 3) | 2); ProtoWire.writeVarint(out3, 2L)
    out3.write('h'); out3.write('i')
    ProtoWire.writeVarint(out3, (3L << 3) | 5) // field 3 as fixed32: mismatch
    out3.write(Array[Byte](1, 2, 3, 4))
    val got3 = ProtoWire.decode(Seq(Tuple1(out3.toByteArray)).toDF("proto"), "proto", msg)
      .select("text", "code").collect().head
    assert(got3.getString(0) == "hi" && got3.isNullAt(1),
      s"skipped mismatch must not clear the decoded member, got $got3")
    // legal oneof member names containing the word 'repeated' parse
    assert(ProtoWire.parseDescriptor(
      "message R { oneof b { int64 repeated_errors = 1; int64 other = 2; } }")
      .fields.map(_.name) == Seq("repeated_errors", "other"))
    // maps are not legal oneof members: rejected, not silently lifted out
    intercept[IllegalArgumentException](ProtoWire.parseDescriptor(
      "message Q { oneof b { map<string, int64> kv = 1; int64 x = 2; } }"))
  }

  test("nested struct columns bind by NAME; singular message occurrences merge") {
    import graft.serde.ProtoWire
    val msg = ProtoWire.parseDescriptor(
      "message D { int64 id = 1; Meta meta = 2; message Meta { string lang = 1; sint64 neg = 2; } }")
    // caller's struct fields in REVERSE of descriptor order: positional
    // cast would swap them (string into a long slot silently nulls)
    val df = Seq((1L, -5L, "en")).toDF("id", "n", "l")
      .select(col("id"), struct(col("n").as("neg"), col("l").as("lang")).as("meta"))
    val back = ProtoWire.decode(ProtoWire.encode(df, msg, keep = Nil), "proto", msg)
      .select(col("id"), col("meta.lang"), col("meta.neg"))
      .as[(Long, String, Long)].head()
    assert(back == ((1L, "en", -5L)))
    // proto3 merge: two wire occurrences of singular `meta`, each setting a
    // different member — a last-wins decoder would lose lang
    val sub1 = new java.io.ByteArrayOutputStream() // Meta{lang:"en"}
    ProtoWire.writeVarint(sub1, (1L << 3) | 2); ProtoWire.writeVarint(sub1, 2L)
    sub1.write('e'); sub1.write('n')
    val sub2 = new java.io.ByteArrayOutputStream() // Meta{neg:-5}
    ProtoWire.writeVarint(sub2, (2L << 3) | 0); ProtoWire.writeVarint(sub2, 9L) // zigzag(-5)
    val outer = new java.io.ByteArrayOutputStream()
    ProtoWire.writeVarint(outer, (1L << 3) | 0); ProtoWire.writeVarint(outer, 7L)
    for (sub <- Seq(sub1, sub2)) {
      ProtoWire.writeVarint(outer, (2L << 3) | 2)
      ProtoWire.writeVarint(outer, sub.size().toLong)
      outer.write(sub.toByteArray)
    }
    val merged = ProtoWire.decode(Seq(Tuple1(outer.toByteArray)).toDF("proto"), "proto", msg)
      .select(col("id"), col("meta.lang"), col("meta.neg"))
      .as[(Long, String, Long)].head()
    assert(merged == ((7L, "en", -5L)), s"occurrences must merge, got $merged")
  }

  test("json schema validation: type-mismatched fields are not 'malformed' (presence semantics)") {
    import graft.serde.JsonSchema
    val schema =
      """{"type":"object","properties":{"id":{"type":"integer"},"text":{"type":"string"},
        |"tags":{"type":"array","items":{"type":"string"}}},"required":["id","text"]}""".stripMargin
    val rows = Seq(
      (1L, """{"id":1,"text":"x","tags":5}"""),       // optional field wrong type
      (2L, """{"id":"notanint","text":"x"}"""),       // required field wrong type, present
      (3L, """[{"id":1,"text":"x"}]"""),              // array, not an object
      (4L, """5"""))                                  // scalar, not an object
    val got = rows.toDF("rid", "p")
      .select(col("rid"),
        JsonSchema.isValid(col("p"), schema).as("v"),
        JsonSchema.error(col("p"), schema).as("e"))
      .as[(Long, Boolean, String)].collect().sortBy(_._1)
    // presence, not type: 1 and 2 are valid (DuckDB json_extract agrees);
    // non-objects are malformed
    assert(got.toSeq == Seq(
      (1L, true, null), (2L, true, null),
      (3L, false, "malformed"), (4L, false, "malformed")))
    // the mismatched field itself decodes to null without poisoning siblings
    val dec = rows.toDF("rid", "p").select(col("rid"),
        JsonSchema.decode(col("p"), schema).getField("text").as("t"),
        JsonSchema.decode(col("p"), schema).getField("tags").as("g"))
      .where(col("rid") === 1L).head()
    assert(dec.getString(1) == "x" && dec.isNullAt(2))
  }

  test("proto events roundtrip and unknown fields are skipped by wire type") {
    import graft.serde.ProtoWire
    val rows = Seq((1L, "view", 3.5), (2L, "héllo✓", -0.0), (3L, "", Double.NaN))
    val df = rows.toDF("event_id", "event_type", "value")
    val back = ProtoWire.decodeEvents(ProtoWire.encodeEvents(df), "proto")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    rows.zip(back).foreach { case ((id, et, v), (id2, et2, v2)) =>
      assert(id == id2 && et == et2)
      assert(java.lang.Double.doubleToLongBits(v) == java.lang.Double.doubleToLongBits(v2))
    }
    // prepend an unknown field (field 9, varint) + (field 10, length-delim):
    // decoder must skip both and still find fields 1..3
    val out = new java.io.ByteArrayOutputStream()
    ProtoWire.writeVarint(out, (9L << 3) | 0); ProtoWire.writeVarint(out, 999L)
    ProtoWire.writeVarint(out, (10L << 3) | 2); ProtoWire.writeVarint(out, 3L)
    out.write(Array[Byte](1, 2, 3), 0, 3)
    val prefix = out.toByteArray
    val withUnknown = ProtoWire.encodeEvents(df)
      .withColumn("proto", concat(typedLit(prefix), col("proto")))
    val back2 = ProtoWire.decodeEvents(withUnknown, "proto")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(back2.map(r => (r._1, r._2)).toSeq == rows.map(r => (r._1, r._2)))
  }
}
