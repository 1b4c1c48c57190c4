package graft.llm

import org.apache.spark.sql.Dataset

import graft.llm.Multimodal.Media

/** RTF text extraction (round 13): the legacy-document format still
  * everywhere in enterprise and government corpora. RTF is STRUCTURAL
  * in the decision-record sense: a brace-group tree of control words
  * with inline parameters — no lookup data, and a parsing mistake
  * drops markup or drops a group, never emits markup as prose.
  *
  * The documented subset (RTF 1.9 word-control model):
  *  - groups `{…}` nest; destination groups whose first control word
  *    is in the skip set (fonttbl/colortbl/stylesheet/info/pict/…) or
  *    that open with `\*` (the spec's "ignore if unknown" marker)
  *    contribute NO text;
  *  - `\par`/`\line` → line break, `\tab` → tab, `\~` → space;
  *  - `\'hh` is a code-page byte (Latin-1/cp1252 scope, the same
  *    printable-range equivalence the PDF layer documents), `\uN` a
  *    signed 16-bit Unicode scalar followed by ONE fallback character
  *    to skip (the spec default `\uc1`);
  *  - `\\`, `\{`, `\}` are literals; raw CR/LF in the file are writer
  *    line wrapping, NOT text; every other control word is consumed
  *    with its parameter and vanishes;
  *  - output whitespace collapses to single spaces (the
  *    [[Warc.htmlText]] convention shared by latex/markdown).
  *
  * Total function, never a throw. Reference scope: kafi has no
  * document surface; LLM-pipeline extension breadth.
  */
object Rtf {

  private val skipDests = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "filetbl",
    "listtable", "listoverridetable", "header", "footer", "themedata",
    "generator", "xmlnstbl", "revtbl")

  private[graft] def rtfText(src: String): String = {
    if (src == null || !src.startsWith("{\\rtf")) return ""
    val n = src.length
    val out = new java.lang.StringBuilder
    // group stack: true = suppressed (destination / \* group)
    var skipDepth = 0 // depth within a suppressed subtree (0 = emitting)
    var depth = 0
    var i = 0
    var groupStart = false // just entered a group: next control word may name a destination

    def isLetter(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    val suppressedAt = new java.util.ArrayDeque[Integer]()

    while (i < n) {
      val c = src.charAt(i)
      c match {
        case '{' =>
          depth += 1; groupStart = true; i += 1
        case '}' =>
          if (skipDepth > 0 && !suppressedAt.isEmpty && suppressedAt.peek() == depth) {
            suppressedAt.pop(); skipDepth -= 1
          }
          depth = math.max(0, depth - 1); groupStart = false; i += 1
        case '\\' if i + 1 < n =>
          val d = src.charAt(i + 1)
          if (d == '*' && groupStart) {
            // {\* …}: ignorable destination — suppress the whole group
            // (and clear groupStart, else the destination word that
            // follows would double-suppress the same group)
            suppressedAt.push(depth); skipDepth += 1; groupStart = false; i += 2
          } else if (d == '\'') {
            if (i + 3 < n) {
              val hv = try Integer.parseInt(src.substring(i + 2, i + 4), 16)
              catch { case _: NumberFormatException => -1 }
              if (hv >= 0 && skipDepth == 0) out.append(hv.toChar)
              i += 4
            } else i = n
          } else if (d == '\\' || d == '{' || d == '}') {
            if (skipDepth == 0) out.append(d); i += 2
          } else if (d == '~') {
            if (skipDepth == 0) out.append(' '); i += 2
          } else if (isLetter(d)) {
            var j = i + 1
            while (j < n && isLetter(src.charAt(j))) j += 1
            val word = src.substring(i + 1, j)
            var param = 0L
            var hasParam = false
            if (j < n && (src.charAt(j) == '-' || src.charAt(j).isDigit)) {
              val s0 = j
              if (src.charAt(j) == '-') j += 1
              while (j < n && src.charAt(j).isDigit && j - s0 < 12) j += 1
              param = try src.substring(s0, j).toLong catch { case _: NumberFormatException => 0L }
              hasParam = true
            }
            if (j < n && src.charAt(j) == ' ') j += 1 // the delimiter space is markup
            if (groupStart && skipDests.contains(word)) {
              suppressedAt.push(depth); skipDepth += 1
            } else if (skipDepth == 0) {
              word match {
                case "par" | "line" | "row" => out.append('\n')
                case "tab" | "cell" => out.append('\t')
                case "u" if hasParam =>
                  val cp = ((param % 65536) + 65536) % 65536
                  out.append(cp.toChar)
                  // skip ONE fallback char (\uc1 default); it may itself
                  // be an \'hh escape
                  if (j + 3 < n && src.charAt(j) == '\\' && src.charAt(j + 1) == '\'') j += 4
                  else if (j < n && src.charAt(j) != '\\' && src.charAt(j) != '{' && src.charAt(j) != '}') j += 1
                case _ => () // formatting words vanish
              }
            }
            groupStart = false
            i = j
          } else i += 2 // unknown control symbol: vanishes
        case '\r' | '\n' => i += 1 // writer wrapping, not text
        case _ =>
          if (skipDepth == 0) out.append(c)
          if (!c.isWhitespace) groupStart = false
          i += 1
      }
    }
    out.toString.split("\\s+").filter(_.nonEmpty).mkString(" ")
  }

  /** RTF blobs → (doc_id, text), a pure map kernel. */
  def rtfTexts(ds: Dataset[Media]): Dataset[(Long, String)] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map(m =>
      (m.doc_id, rtfText(new String(m.media, java.nio.charset.StandardCharsets.ISO_8859_1)))))
  }

  /** A well-formed RTF: header with font/color tables (must not
    * leak), an info destination, an ignorable `{\*\generator}` group,
    * then paragraphs with nested bold groups; inside a paragraph,
    * `\'hh` encodes any non-ASCII Latin-1 char and `\uN x` any BMP
    * char with an ASCII fallback the reader must skip. */
  def syntheticRtf(paragraphs: Seq[String], unicodePara: Option[String]): Array[Byte] = {
    val sb = new java.lang.StringBuilder
    sb.append("{\\rtf1\\ansi\\ansicpg1252\\deff0\n")
    sb.append("{\\fonttbl{\\f0\\fswiss Helvetica;}{\\f1\\fmodern Courier;}}\n")
    sb.append("{\\colortbl;\\red255\\green0\\blue0;}\n")
    sb.append("{\\info{\\title secret title}{\\author nobody}}\n")
    sb.append("{\\*\\generator graft 13;}\n")
    paragraphs.zipWithIndex.foreach { case (p, idx) =>
      sb.append("\\pard\\f0\\fs24 ")
      // alternate a nested bold group mid-paragraph
      val cut = p.length / 2
      if (idx % 2 == 0 && cut > 0)
        sb.append(escape(p.substring(0, cut))).append("{\\b ")
          .append(escape(p.substring(cut))).append("}")
      else sb.append(escape(p))
      sb.append("\\par\n")
    }
    unicodePara.foreach { u =>
      sb.append("\\pard ")
      u.foreach { ch =>
        if (ch < 128) sb.append(escape(ch.toString))
        else if (ch < 256) sb.append(f"\\'${ch.toInt}%02x")
        else sb.append(s"\\u${ch.toInt}?") // '?' fallback, must be skipped
      }
      sb.append("\\par\n")
    }
    sb.append("}")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private def escape(s: String): String = {
    val sb = new java.lang.StringBuilder
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '{' => sb.append("\\{")
      case '}' => sb.append("\\}")
      case '\t' => sb.append("\\tab ")
      case '\n' => sb.append("\\line ")
      case c if c > 127 && c < 256 => sb.append(f"\\'${c.toInt}%02x")
      case c => sb.append(c)
    }
    sb.toString
  }
}
