package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Markdown text extraction (round 13): README/docs corpora are
  * markdown, and the curation-relevant prose hides behind fences,
  * link syntax, and emphasis markers. A line-structural pass (fences,
  * headings, quotes, list markers, setext underlines, reference
  * definitions) followed by inline rewrites (images → alt, links →
  * text, code spans → content, `*` emphasis markers removed), then
  * the [[Warc.htmlText]] pass for inline HTML, entities, and the
  * whitespace collapse — markdown IS an HTML-adjacent format, so the
  * tail of the pipeline is shared, not duplicated.
  *
  * Documented trades: fenced code blocks are DROPPED (code is not
  * prose — the code-corpus path wants the raw file, not the
  * extraction); underscore emphasis is left alone (stripping `_`
  * would mangle snake_case identifiers, the classic naive-extractor
  * bug); tables lose their `|` frame but keep cell text. Total
  * function, never a throw.
  *
  * Reference scope: kafi has no markdown surface; LLM-pipeline
  * extension breadth.
  */
object Markdown {

  private val ReImage = java.util.regex.Pattern.compile("!\\[([^\\]]*)\\]\\([^)]*\\)")
  private val ReLink = java.util.regex.Pattern.compile("\\[([^\\]]*)\\]\\(([^)]*)\\)")
  private val ReRefLink = java.util.regex.Pattern.compile("\\[([^\\]]*)\\]\\[[^\\]]*\\]")
  private val ReCodeSpan = java.util.regex.Pattern.compile("`([^`]*)`")
  private val ReSetext = java.util.regex.Pattern.compile("^\\s{0,3}[=-]{2,}\\s*$")
  private val ReRefDef = java.util.regex.Pattern.compile("^\\s{0,3}\\[[^\\]]+\\]:\\s.*$")
  private val ReListMarker = java.util.regex.Pattern.compile("^\\s*(?:[-+*]|\\d{1,9}[.)])\\s+")

  private[graft] def mdText(src: String): String = {
    if (src == null) return ""
    val out = new java.lang.StringBuilder
    var inFence = false
    src.split("\n", -1).foreach { line0 =>
      val line = if (line0.endsWith("\r")) line0.substring(0, line0.length - 1) else line0
      val trimmed = line.trim
      if (trimmed.startsWith("```") || trimmed.startsWith("~~~")) {
        inFence = !inFence
      } else if (!inFence) {
        if (!ReSetext.matcher(line).matches() && !ReRefDef.matcher(line).matches()) {
          var l = line
          // blockquote markers (nested), then heading hashes, then list markers
          while (l.startsWith(">") || (l.startsWith(" ") && l.trim.startsWith(">")))
            l = l.trim.substring(1)
          if (l.trim.startsWith("#")) l = l.trim.dropWhile(_ == '#')
          l = ReListMarker.matcher(l).replaceFirst(" ")
          l = ReImage.matcher(l).replaceAll("$1")
          l = ReLink.matcher(l).replaceAll("$1")
          l = ReRefLink.matcher(l).replaceAll("$1")
          l = ReCodeSpan.matcher(l).replaceAll("$1")
          l = l.replace("*", "").replace("|", " ")
          out.append(l).append('\n')
        }
      }
    }
    Warc.htmlText(out.toString) // inline HTML, entities, whitespace collapse
  }

  /** (id, markdown) rows → (id, text) — a pure map kernel. */
  def mdTexts(df: DataFrame, idCol: String, srcCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(srcCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, s) => (id, mdText(s)) })
      .toDF(idCol, "text")
  }

  /** YAML-style front matter (round 13): the `---`-fenced `key: value`
    * block static-site corpora (Jekyll/Hugo blogs, docs trees) lead
    * with — curation wants it as METADATA (title, date, tags, draft
    * flags) and stripped from the prose. Scope is the flat scalar
    * subset (one `key: value` per line, quotes around the value
    * stripped, `#` needs no special case because values are taken
    * verbatim); list/nested YAML values pass through as raw text —
    * documented, not guessed at. Returns (key, value) pairs in file
    * order; None when the document has no front-matter fence. */
  private[graft] def frontMatter(src: String): Option[Seq[(String, String)]] = {
    if (src == null) return None
    val lines = src.split("\n", -1)
    if (lines.isEmpty || lines(0).trim != "---") return None
    val out = Seq.newBuilder[(String, String)]
    var i = 1
    while (i < lines.length) {
      val l = lines(i).trim
      if (l == "---" || l == "...") return Some(out.result())
      val colon = l.indexOf(':')
      if (colon > 0) {
        val k = l.substring(0, colon).trim
        var v = l.substring(colon + 1).trim
        if (v.length >= 2 && ((v.head == '"' && v.last == '"') ||
          (v.head == '\'' && v.last == '\''))) v = v.substring(1, v.length - 1)
        out += (k -> v)
      }
      i += 1
    }
    None // fence never closed: not front matter, the whole doc is prose
  }

  /** (id, markdown) → (id, key_idx, key, value) front-matter rows;
    * docs without front matter contribute nothing. */
  def mdFrontMatter(df: DataFrame, idCol: String, srcCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(srcCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, s) =>
        frontMatter(s).getOrElse(Nil).zipWithIndex.map {
          case ((k, v), ix) => (id, ix, k, v)
        }
      }
      .toDF(idCol, "key_idx", "key", "value")
  }
}
