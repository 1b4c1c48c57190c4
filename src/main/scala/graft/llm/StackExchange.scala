package graft.llm

import org.apache.spark.sql.Dataset

import graft.llm.Multimodal.Media

/** Stack Exchange dump ingestion (round 13): the Q&A corpus. The
  * archive.org data dumps ship one XML file per table whose records
  * are ATTRIBUTE-based self-closing `<row …/>` elements — the opposite
  * XML shape to [[Wiki]]'s element-based pages, which is why it gets
  * its own walk instead of riding that one. Values are XML-entity-
  * encoded; `Body` is entity-encoded HTML (decode, then the shared
  * [[Warc.htmlText]] tail), `Tags` is the dump's `&lt;a&gt;&lt;b&gt;`
  * bracket-list convention.
  *
  * Structural throughout (framing + entity decode, no normative
  * data); a malformed row loses its own fields and nothing else —
  * walk posture identical to [[Warc]]/[[Wiki]]: pure flatMap kernel,
  * record bytes never shuffle.
  *
  * Reference scope: kafi has no dump surface; LLM-pipeline extension
  * breadth.
  */
object StackExchange {

  /** One `<row/>`: `post_type` 1 = question, 2 = answer (the dump's
    * PostTypeId); `title`/`tags` are empty on answers by the dump's
    * own convention; `body_text` is the extracted text of Body. */
  case class SePost(doc_id: Long, row_idx: Int, post_id: Long, post_type: Int,
      score: Int, title: String, tags: String, body_text: String)

  private val ReRow = java.util.regex.Pattern.compile("<row\\b([^>]*?)/?>")
  private val ReAttr = java.util.regex.Pattern.compile(
    "([A-Za-z][A-Za-z0-9]*)\\s*=\\s*\"([^\"]*)\"")
  private val ReTagList = java.util.regex.Pattern.compile("<([^<>]*)>")

  /** Attributes of one row element, names as-is, values entity-decoded. */
  private def attrs(s: String): Map[String, String] = {
    val m = ReAttr.matcher(s)
    val out = Map.newBuilder[String, String]
    while (m.find()) out += (m.group(1) -> Docs.xmlUnescape(m.group(2)))
    out.result()
  }

  /** The dump's `<a><b>` tag-list convention → "a,b". After entity
    * decode the brackets are literal; a plain comma list (newer dumps)
    * passes through unchanged. */
  private[graft] def parseTags(raw: String): String = {
    if (raw == null || raw.isEmpty) return ""
    if (!raw.contains('<')) return raw
    val m = ReTagList.matcher(raw)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group(1)
    out.result().mkString(",")
  }

  /** Dump walk → posts. Rows missing Id are skipped (corrupt-input
    * posture); missing numeric fields default to 0. */
  private[graft] def parsePosts(raw: Array[Byte]): Seq[SePost] = {
    if (raw == null || raw.length < 5) return Nil
    try {
      val b = Archives.decompressAny(raw).getOrElse(return Nil)
      val xml = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      val m = ReRow.matcher(xml)
      val out = Seq.newBuilder[SePost]
      var idx = 0
      while (m.find()) {
        val a = attrs(m.group(1))
        a.get("Id").flatMap(_.toLongOption) match {
          case Some(pid) =>
            out += SePost(-1L, idx, pid,
              a.get("PostTypeId").flatMap(_.toIntOption).getOrElse(0),
              a.get("Score").flatMap(_.toIntOption).getOrElse(0),
              a.getOrElse("Title", ""),
              parseTags(a.getOrElse("Tags", "")),
              Warc.htmlText(a.getOrElse("Body", "")))
            idx += 1
          case None => // skip the row, keep walking
        }
      }
      out.result()
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** Dump blobs → post rows, a pure flatMap kernel. */
  def posts(ds: Dataset[Media]): Dataset[SePost] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { m =>
      parsePosts(m.media).map(p => p.copy(doc_id = m.doc_id))
    })
  }

  /** A Posts.xml dump: `rows` = (Id, PostTypeId, Score, Title, Tags
    * as plain names, BodyHtml). Title/Tags written only on questions
    * (the dump convention); everything entity-encoded on the way in.
    * `compress` as in [[Archives.syntheticJsonl]]. */
  def syntheticPosts(rows: Seq[(Long, Int, Int, String, Seq[String], String)],
      compress: Int): Array[Byte] = {
    def enc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    val sb = new java.lang.StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n<posts>\n")
    rows.foreach { case (id, ptype, score, title, tags, body) =>
      sb.append(s"""  <row Id="$id" PostTypeId="$ptype" """)
      sb.append(s"""CreationDate="2026-01-02T03:04:05.000" Score="$score" """)
      if (ptype == 1) {
        sb.append(s"""Title="${enc(title)}" """)
        sb.append(s"""Tags="${enc(tags.map(t => s"<$t>").mkString)}" """)
      }
      sb.append(s"""Body="${enc(body)}" />""").append('\n')
    }
    sb.append("</posts>\n")
    val plain = sb.toString.getBytes("UTF-8")
    compress match {
      case 1 =>
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(plain); gz.close()
        bos.toByteArray
      case 2 => com.github.luben.zstd.Zstd.compress(plain, 3)
      case 4 =>
        val bos = new java.io.ByteArrayOutputStream()
        val z = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(bos, 1)
          // blockSize 1 (100 kB work arrays, not default 9's ~8 MB): fixture
          // payloads are <4 kB, so the bytes out are identical while the
          // per-call allocation storm that polluted the r13 driver-bench CPU
          // reading (VERDICT r13 task 1) disappears
        z.write(plain); z.close()
        bos.toByteArray
      case _ => plain
    }
  }
}
