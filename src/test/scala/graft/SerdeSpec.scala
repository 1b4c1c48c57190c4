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
}
