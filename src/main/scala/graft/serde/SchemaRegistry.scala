package graft.serde

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import scala.collection.concurrent.TrieMap

/** Confluent Schema Registry client (kafi/schemaregistry.py:24-236) — the
  * admin-plane companion of the Confluent wire format in [[Serde]]:
  * register / lookup-by-id / subject versions / latest, with an id→schema
  * cache (schema ids are immutable, so the cache never invalidates).
  *
  * Plain JDK HTTP — no extra dependencies; the data plane never calls this
  * per row (resolve ids up front, decode with [[AvroSerde]]/from_json).
  * Driver-side by design: executors receive resolved schemas via closure
  * capture or broadcast, never a registry connection each.
  */
class SchemaRegistry(baseUrl: String,
    client: HttpClient = HttpClient.newHttpClient()) {

  private val byId = TrieMap.empty[Int, String]

  private def get(path: String): String = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"$baseUrl$path"))
        .header("Accept", "application/vnd.schemaregistry.v1+json").GET().build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"registry GET $path -> ${resp.statusCode()}: ${resp.body()}")
    resp.body()
  }

  private def post(path: String, body: String): String = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"$baseUrl$path"))
        .header("Content-Type", "application/vnd.schemaregistry.v1+json")
        .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8)).build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"registry POST $path -> ${resp.statusCode()}: ${resp.body()}")
    resp.body()
  }

  // minimal JSON field extraction (registry payloads are flat here; avoids
  // a JSON dependency in this tiny admin client)
  private def jsonInt(body: String, field: String): Int =
    s""""$field"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(body)
      .getOrElse(sys.error(s"no $field in: $body")).group(1).toInt

  private def jsonStr(body: String, field: String): String = {
    val m = s""""$field"\\s*:\\s*"""".r.findFirstMatchIn(body)
      .getOrElse(sys.error(s"no $field in: $body"))
    // manual scan handles escaped quotes inside the schema string
    val sb = new StringBuilder
    var i = m.end
    while (i < body.length && body.charAt(i) != '"') {
      if (body.charAt(i) == '\\' && i + 1 < body.length) { sb.append(body.charAt(i + 1)); i += 2 }
      else { sb.append(body.charAt(i)); i += 1 }
    }
    sb.result()
  }

  /** Schema text by id (cached — ids are immutable).
    * GET /schemas/ids/{id} (schemaregistry.py lookup path). */
  def schemaById(id: Int): String =
    byId.getOrElseUpdate(id, jsonStr(get(s"/schemas/ids/$id"), "schema"))

  /** Register a schema under a subject, returning its id.
    * POST /subjects/{subject}/versions. */
  def register(subject: String, schemaJson: String): Int = {
    val escaped = schemaJson.replace("\\", "\\\\").replace("\"", "\\\"")
    jsonInt(post(s"/subjects/$subject/versions", s"""{"schema": "$escaped"}"""), "id")
  }

  /** Version numbers of a subject. GET /subjects/{subject}/versions. */
  def versions(subject: String): Seq[Int] =
    "\\d+".r.findAllIn(get(s"/subjects/$subject/versions")).map(_.toInt).toSeq

  /** Latest schema (id, text) of a subject.
    * GET /subjects/{subject}/versions/latest. */
  def latest(subject: String): (Int, String) = {
    val body = get(s"/subjects/$subject/versions/latest")
    (jsonInt(body, "id"), jsonStr(body, "schema"))
  }
}
