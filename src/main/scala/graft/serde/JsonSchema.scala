package graft.serde

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON-Schema payload type (`jsonschema` / `json_sr` in the reference,
  * kafi/deserializer.py:27-43 + kafi/schemaregistry.py:24-236): the sixth
  * member of SURVEY §1.2's payload-type set. The reference validates every
  * JSON payload against a registry-held JSON Schema on deserialize and
  * raises on violation; here validation is a pure Column expression —
  * per-row valid/error columns instead of a per-row exception, so one bad
  * record flags itself rather than killing a 100 TB scan. Decode and
  * validation both stay inside whole-stage codegen (from_json /
  * get_json_object built-ins; no UDF, no per-row schema parse — the schema
  * is compiled to a StructType ONCE on the driver).
  *
  * Supported subset (the part the reference's tests exercise,
  * test/test_single_storage_base.py:583-726): type object/array/string/
  * integer/number/boolean, nested properties, `required`, and nullable
  * unions (["string","null"]). `format`/`pattern`/bounds are accepted but
  * not enforced — documented, since Spark-side enforcement would need a
  * per-row regex/compare that the caller can add as ordinary filters.
  *
  * Validation semantics (aligned with the DuckDB oracle, q_serde_jsonschema):
  *  - malformed JSON (or a non-object where an object is required) → invalid;
  *  - a top-level required field missing OR JSON-null → invalid
  *    (get_json_object and DuckDB's json_extract both return SQL NULL for
  *    exactly those two cases — verified behavior, not an assumption);
  *  - a type-mismatched field decodes to null silently (PERMISSIVE
  *    from_json) and validation checks PRESENCE, not type — DuckDB's
  *    json_extract agrees; the reference's jsonschema library is stricter
  *    (it would reject the mismatched type). Callers needing type
  *    enforcement add ordinary filters over the decoded struct.
  */
object JsonSchema {

  /** Compile a JSON-Schema document to the equivalent Spark StructType.
    * Required fields become non-nullable; everything else nullable. */
  def toStruct(schemaJson: String): StructType =
    toDataType(JsonMethods.parse(schemaJson)) match {
      case st: StructType => st
      case other => throw new IllegalArgumentException(
        s"top-level JSON Schema must be an object schema, got $other")
    }

  private def toDataType(j: JValue): DataType = {
    val typ: Seq[String] = j \ "type" match {
      case JString(t) => Seq(t)
      case JArray(ts) => ts.collect { case JString(t) => t }
      case _ if (j \ "properties") != JNothing => Seq("object")
      case _ => Seq("string")
    }
    typ.filterNot(_ == "null").headOption.getOrElse("string") match {
      case "object" =>
        val req: Set[String] = j \ "required" match {
          case JArray(rs) => rs.collect { case JString(r) => r }.toSet
          case _ => Set.empty
        }
        val props = j \ "properties" match {
          case JObject(fields) => fields
          case _ => Nil
        }
        StructType(props.map { case (name, sub) =>
          StructField(name, toDataType(sub), nullable = !req.contains(name))
        })
      case "array" => ArrayType(toDataType(j \ "items"))
      case "integer" => LongType
      case "number" => DoubleType
      case "boolean" => BooleanType
      case _ => StringType
    }
  }

  /** Top-level required field names, in schema order. Superseded by
    * [[requiredPaths]] (which also walks nested objects) — the validation
    * columns below are built from the full walk, not from this. */
  def required(schemaJson: String): Seq[String] =
    JsonMethods.parse(schemaJson) \ "required" match {
      case JArray(rs) => rs.collect { case JString(r) => r }
      case _ => Nil
    }

  /** A required entry: the parent object's path segments and the required
    * member's segments. Segment lists (not dot-joined strings) so a
    * property literally NAMED "a.b" stays one segment and compiles to the
    * bracket JSONPath `$['a.b']`, not a two-level lookup. */
  private case class ReqPath(parent: Seq[String], segs: Seq[String]) {
    def display: String = segs.mkString(".")
  }

  private def requiredEntries(schemaJson: String): Seq[ReqPath] = {
    def walk(j: JValue, prefix: Seq[String]): Seq[ReqPath] = {
      val here = (j \ "required" match {
        case JArray(rs) => rs.collect { case JString(r) => r }
        case _ => Nil
      }).map(r => ReqPath(prefix, prefix :+ r))
      val below = j \ "properties" match {
        case JObject(fields) => fields.flatMap { case (name, sub) =>
          walk(sub, prefix :+ name)
        }
        case _ => Nil
      }
      here ++ below
    }
    walk(JsonMethods.parse(schemaJson), Nil)
  }

  /** Every `required` entry at ANY depth as (parentPath, fieldPath)
    * display pairs in schema walk order (root first, then properties
    * depth-first); parentPath "" = the root object. JSON-Schema semantics:
    * a nested object's `required` list applies only when that object is
    * PRESENT — the validation columns below implement exactly that
    * conditionality. */
  def requiredPaths(schemaJson: String): Seq[(String, String)] =
    requiredEntries(schemaJson).map(e => (e.parent.mkString("."), e.display))

  private def jsonPath(segs: Seq[String]): String =
    "$" + segs.map { s =>
      if (s.matches("[A-Za-z0-9_]+")) s".$s"
      else {
        // Spark's JsonPathParser bracket grammar is [^'?]+ — no quote
        // escaping exists, so a name containing ' or ? cannot be addressed
        // at all. Fail at schema-compile time (driver side) rather than
        // silently reporting the field missing on every row.
        require(!s.exists(ch => ch == '\'' || ch == '?'),
          s"JSON-Schema property name '$s' contains ' or ? — not addressable by Spark's JSONPath")
        s"['$s']"
      }
    }.mkString

  /** True when this required entry is violated: the parent object is
    * present (root always is, once parsed) but the required member is
    * absent or JSON-null. */
  private def violated(payload: Column, e: ReqPath): Column =
    if (e.parent.isEmpty) get_json_object(payload, jsonPath(e.segs)).isNull
    else
      get_json_object(payload, jsonPath(e.parent)).isNotNull &&
        get_json_object(payload, jsonPath(e.segs)).isNull

  /** True when the payload is one standalone well-formed JSON value.
    * `try_parse_json` (variant parse) nulls on anything else — the guard
    * that keeps wrapper-based scalar decode from being an injection
    * surface: payload `1,"v":2` is NOT valid JSON but would complete the
    * wrapper below into one ({"v":1,"v":2}, last duplicate key wins). */
  private def wellFormed(payload: Column): Column =
    try_parse_json(payload).isNotNull

  /** Decode a JSON string payload against the compiled schema. Malformed
    * payloads decode to an all-null struct (PERMISSIVE), never an
    * exception. NON-OBJECT root schemas are legal JSON-Schema and the
    * reference produces them (a bare string/integer key:
    * test_single_storage_base.py's jsonschema_no_dict case); Spark's
    * from_json only takes struct/array roots, so a scalar root decodes
    * through a `{"v": <payload>}` wrapper struct — guarded by
    * [[wellFormed]] so only standalone-valid JSON reaches the wrapper.
    * Two root-strictness guards from_json alone would miss: an ARRAY root
    * requires a `[` payload (from_json silently wraps a lone object into a
    * 1-element array), and a STRING root requires a quoted payload
    * (Jackson stringifies bare numbers; the reference's validator rejects
    * 12 against type:string). Other scalar roots get strictness from
    * Jackson itself (a quoted "abc" never coerces to integer). */
  def decode(payload: Column, schemaJson: String): Column =
    toDataType(JsonMethods.parse(schemaJson)) match {
      case st: StructType => from_json(payload, st)
      case at: ArrayType =>
        when(startswith(ltrim(payload), lit("[")), from_json(payload, at))
      case dt =>
        val wrapped = from_json(concat(lit("{\"v\":"), payload, lit("}")),
          StructType(Seq(StructField("v", dt)))).getField("v")
        val typeOk = dt match {
          case StringType => startswith(ltrim(payload), lit("\""))
          case _ => lit(true)
        }
        when(wellFormed(payload) && typeOk, wrapped)
    }

  /** True when the payload is not well-formed JSON or not an object.
    * PERMISSIVE from_json returns an all-null STRUCT for malformed input —
    * not a null column — so the detector is the corrupt-record side
    * channel. The schema passed here contains ONLY `_corrupt_record`
    * (no declared fields): with the full schema, a field TYPE-conversion
    * failure also populates the corrupt column, which would flag
    * type-mismatched payloads as malformed — diverging from both the
    * documented semantics and DuckDB's json_valid. With no declared fields
    * nothing can conversion-fail, so corrupt ⇔ not-an-object (measured:
    * malformed / scalar / array / bare null → corrupt; an object with a
    * type-mismatched field → not corrupt). One documented edge: a bare
    * `null` payload is 'malformed' here but json_valid in DuckDB. */
  def isMalformed(payload: Column, schemaJson: String): Column =
    from_json(payload,
        StructType(Seq(StructField("_corrupt_record", StringType))),
        Map("columnNameOfCorruptRecord" -> "_corrupt_record"))
      .getField("_corrupt_record").isNotNull

  /** True iff the payload parses as the schema's object AND every required
    * field — at any depth, conditional on its parent's presence — is
    * present and non-null. For a NON-OBJECT root schema: true iff the
    * payload parses (and, for a scalar root, coerces to the scalar type —
    * `"abc"` against an integer root is invalid; a shade stricter than the
    * object branch's presence-only checks, and what the wrapper decode
    * gives for free). */
  def isValid(payload: Column, schemaJson: String): Column =
    toDataType(JsonMethods.parse(schemaJson)) match {
      case _: StructType =>
        requiredEntries(schemaJson).foldLeft(!isMalformed(payload, schemaJson))((acc, e) =>
          acc && !violated(payload, e))
      case _ => decode(payload, schemaJson).isNotNull
    }

  /** Error report: null when valid, 'malformed' when unparseable, else
    * 'missing:<path>' for the FIRST violated required entry (schema walk
    * order, e.g. 'missing:meta.src'). Mirrors the reference's
    * ValidationError message, reduced to a deterministic code the oracle
    * can recompute. */
  def error(payload: Column, schemaJson: String): Column =
    toDataType(JsonMethods.parse(schemaJson)) match {
      case _: StructType =>
        val base = when(isMalformed(payload, schemaJson), lit("malformed"))
        requiredEntries(schemaJson).foldLeft(base)((acc, e) =>
          acc.when(violated(payload, e), lit(s"missing:${e.display}")))
          .otherwise(lit(null).cast("string"))
      case _ =>
        when(decode(payload, schemaJson).isNull, lit("malformed"))
          .otherwise(lit(null).cast("string"))
    }

  /** Registry wiring: compile the JSON Schema held under a registry id —
    * the `json_sr` payload type's schema resolution path (driver-side once,
    * never per row). */
  def structFromRegistry(sr: SchemaRegistry, id: Int): StructType =
    toStruct(sr.schemaById(id))
}
