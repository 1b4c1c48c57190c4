package graft.llm

import org.apache.spark.sql.Dataset

import graft.llm.Multimodal.Media

/** BibTeX ingestion (round 13): the citation-metadata side of the
  * arXiv/papers corpus — dedup by DOI/title, author graphs, and
  * provenance all start from .bib files. The format is structural: a
  * stream of `@type{key, field = value, …}` entries whose values are
  * brace-balanced groups, quoted strings, or bare words, concatenated
  * with `#`; `@string` defines macros the values reference;
  * `@comment`/`@preamble` are noise. Whitespace runs inside values
  * collapse to one space (the BibTeX rule — .bib files hard-wrap).
  *
  * Scope, documented: brace groups inside values keep their inner
  * text and lose the braces (the {Case-Protection} convention);
  * unknown macros resolve to their own name (fail-open); an
  * unterminated entry drops that entry and stops (prefix posture).
  *
  * Reference scope: kafi has no bibliography surface; LLM-pipeline
  * extension breadth, sibling to [[Latex]].
  */
object Bibtex {

  case class BibEntry(doc_id: Long, entry_idx: Int, entry_type: String,
      cite_key: String, title: String, author: String, year: String)

  private def isWs(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\r'

  /** All entries as (type, key, fields). Total function. */
  private[graft] def parseBib(src: String): Seq[(String, String, Map[String, String])] = {
    if (src == null) return Nil
    val out = Seq.newBuilder[(String, String, Map[String, String])]
    val macros = scala.collection.mutable.Map.empty[String, String]
    val n = src.length
    var i = 0

    def skipWs(): Unit = { while (i < n && isWs(src.charAt(i))) i += 1 }

    def word(): String = {
      val s = i
      while (i < n && (src.charAt(i).isLetterOrDigit || "-_:./+".indexOf(src.charAt(i)) >= 0))
        i += 1
      src.substring(s, i)
    }

    // one brace-balanced group starting at '{'; returns inner text
    // with nested braces dropped, or None if unterminated
    def braceGroup(): Option[String] = {
      var depth = 1
      i += 1
      val sb = new java.lang.StringBuilder
      while (i < n && depth > 0) {
        val c = src.charAt(i)
        c match {
          case '{' => depth += 1
          case '}' => depth -= 1
          case _ => if (depth > 0) sb.append(c)
        }
        i += 1
      }
      if (depth == 0) Some(sb.toString) else None
    }

    def quoted(): Option[String] = {
      i += 1
      val sb = new java.lang.StringBuilder
      var depth = 0 // braces inside quotes protect a literal "
      while (i < n) {
        val c = src.charAt(i)
        if (c == '{') { depth += 1; i += 1 }
        else if (c == '}') { depth -= 1; i += 1 }
        else if (c == '"' && depth == 0) { i += 1; return Some(sb.toString) }
        else { sb.append(c); i += 1 }
      }
      None
    }

    // value = piece (# piece)*; piece = {…} | "…" | bare word/number
    def value(): Option[String] = {
      val sb = new java.lang.StringBuilder
      var more = true
      while (more) {
        skipWs()
        if (i >= n) return None
        val piece: Option[String] = src.charAt(i) match {
          case '{' => braceGroup()
          case '"' => quoted()
          case _ =>
            val w = word()
            if (w.isEmpty) None
            else Some(macros.getOrElse(w.toLowerCase, w)) // unknown macro: its own name
        }
        piece match {
          case Some(p) => sb.append(p)
          case None => return None
        }
        skipWs()
        if (i < n && src.charAt(i) == '#') i += 1 else more = false
      }
      // the BibTeX whitespace rule: runs collapse to one space
      Some(sb.toString.split("[\\s]+").filter(_.nonEmpty).mkString(" "))
    }

    while (i < n) {
      val at = src.indexOf('@', i)
      if (at < 0) return out.result()
      i = at + 1
      val etype = word().toLowerCase
      skipWs()
      if (i >= n || (src.charAt(i) != '{' && src.charAt(i) != '(')) {
        // stray @: keep scanning
      } else if (etype == "comment" || etype == "preamble") {
        if (braceGroup().isEmpty) return out.result()
      } else if (etype == "string") {
        // @string{name = value}
        i += 1
        skipWs()
        val name = word().toLowerCase
        skipWs()
        if (i < n && src.charAt(i) == '=') {
          i += 1
          value() match {
            case Some(v) => macros(name) = v
            case None => return out.result()
          }
        }
        skipWs()
        if (i < n && src.charAt(i) == '}') i += 1
      } else {
        i += 1
        skipWs()
        val key = word()
        skipWs()
        val fields = Map.newBuilder[String, String]
        var ok = true
        var done = false
        while (ok && !done) {
          skipWs()
          if (i >= n) { ok = false }
          else if (src.charAt(i) == '}') { i += 1; done = true }
          else if (src.charAt(i) == ',') i += 1
          else {
            val fname = word().toLowerCase
            skipWs()
            if (fname.isEmpty || i >= n || src.charAt(i) != '=') ok = false
            else {
              i += 1
              value() match {
                case Some(v) => fields += (fname -> v)
                case None => ok = false
              }
            }
          }
        }
        if (ok) out += ((etype, key, fields.result()))
        else return out.result() // prefix posture
      }
    }
    out.result()
  }

  /** .bib blobs → entry rows (flatMap kernel). */
  def bibEntries(ds: Dataset[Media]): Dataset[BibEntry] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { m =>
      parseBib(new String(m.media, java.nio.charset.StandardCharsets.UTF_8))
        .zipWithIndex.map { case ((t, k, f), idx) =>
          BibEntry(m.doc_id, idx, t, k,
            f.getOrElse("title", ""), f.getOrElse("author", ""), f.getOrElse("year", ""))
        }
    })
  }
}
