package graft.serde

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Payload serde — capability parity with kafi/deserializer.py:27-123 and
  * kafi/serializer.py:63-123, as pure Column expressions (everything stays
  * inside whole-stage codegen; no UDFs).
  *
  * Payload types (SURVEY §1.2): bytes ↔ BinaryType, str ↔ StringType,
  * json ↔ from_json/to_json, avro/protobuf ↔ spark-avro / spark-protobuf
  * (their Confluent 5-byte wire prefix handled here; the schema-registry
  * HTTP client is an admin-plane concern outside the data path).
  */
object Serde {

  // ---- str/bytes (deserializer.py:36-43) ----

  def utf8Encode(c: Column): Column = encode(c, "UTF-8")
  def utf8Decode(c: Column): Column = decode(c, "UTF-8")

  // ---- json (deserializer.py:45-57) ----

  /** Decode a JSON string payload against a declared schema. */
  def jsonDecode(c: Column, schema: DataType): Column = from_json(c, schema)

  /** Schema-less single-path extraction (the dynamic-dict analogue). */
  def jsonGet(c: Column, path: String): Column = get_json_object(c, path)

  def jsonEncode(c: Column): Column = to_json(c)

  // ---- Confluent wire format (deserializer.py:104-123, serializer.py:63-87):
  //      magic byte 0x00 + 4-byte big-endian schema id + body ----

  /** Wrap a binary payload with the Confluent wire prefix. The 4-byte id is
    * built with hex/lpad/unhex — all codegen'd built-ins. */
  def confluentWrap(payload: Column, schemaId: Column): Column =
    concat(
      unhex(lit("00")),
      unhex(lpad(hex(schemaId.cast("int")), 8, "0")),
      payload)

  /** Schema id from a Confluent-framed payload (deserializer.py:118).
    * The 4 bytes are a SIGNED big-endian int32: sign-extend through a
    * long instead of casting conv's decimal string straight to int —
    * under ANSI mode that cast THROWS for ids with the high bit set
    * (any corrupt frame could kill a task; found by SerdeFuzzSpec r13). */
  def confluentSchemaId(c: Column): Column =
    shiftright(shiftleft(conv(hex(substring(c, 2, 4)), 16, 10).cast("long"), 32), 32)
      .cast("int")

  /** Body (bytes 6..) of a Confluent-framed payload. */
  def confluentBody(c: Column): Column = substring(c, 6, Int.MaxValue)

  // ---- header-based schema discovery (deserializer.py:104-123): the
  //      __key_schema_id / __value_schema_id header, when present, carries
  //      a version byte (0x01) + 16-byte schema GUID and takes precedence
  //      over the wire-format prefix ----

  def schemaIdHeaderName(isKey: Boolean): String =
    if (isKey) "__key_schema_id" else "__value_schema_id"

  /** Schema GUID from the `__{key,value}_schema_id` envelope header as the
    * canonical lowercase UUID string, or NULL when the header is absent —
    * version byte skipped, 16 GUID bytes hex-grouped 8-4-4-4-12. Pure
    * Column ops (codegen'd); `headers` is the envelope's
    * array<struct<key:string, value:binary>>. */
  def headerSchemaGuid(headers: Column, isKey: Boolean): Column = {
    val name = schemaIdHeaderName(isKey)
    // get(), not [0]: an absent header filters to an EMPTY array, and ANSI
    // mode turns [0] on it into an error instead of the NULL we want
    val raw = get(filter(headers, h => h("key") === lit(name)), lit(0))("value")
    val hx = lower(hex(substring(raw, 2, 16)))
    when(raw.isNull, lit(null).cast("string")).otherwise(concat_ws("-",
      substring(hx, 1, 8), substring(hx, 9, 4), substring(hx, 13, 4),
      substring(hx, 17, 4), substring(hx, 21, 12)))
  }

  /** The effective schema reference of a framed message, as a string:
    * the header GUID when the discovery header is present, else the
    * wire-prefix integer id (deserializer.py:104-123's precedence). */
  def schemaRef(framed: Column, headers: Column, isKey: Boolean): Column =
    coalesce(headerSchemaGuid(headers, isKey), confluentSchemaId(framed).cast("string"))

  /** Driver-side resolution to schema text, completing the discovery path:
    * GUID (header) → [[SchemaRegistry.schemaByGuid]]; integer id (wire
    * prefix) → [[SchemaRegistry.schemaById]]. Accepts [[schemaRef]]'s
    * string form of either. */
  def resolveSchema(sr: SchemaRegistry, ref: String): String =
    if (ref.contains("-")) sr.schemaByGuid(ref) else sr.schemaById(ref.toInt)

  // ---- base64 / millis: single home in graft.functions.Helpers ----

  def b64Encode(c: Column): Column = graft.functions.Helpers.b64Encode(c)
  def b64Decode(c: Column): Column = graft.functions.Helpers.b64Decode(c)
  def toMillis(ts: Column): Column = graft.functions.Helpers.toMillis(ts)
  def fromMillis(ms: Column): Column = graft.functions.Helpers.fromMillis(ms)
}
