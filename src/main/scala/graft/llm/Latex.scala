package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** LaTeX text extraction (round 13): arXiv is one of the largest
  * high-quality text sources in any training mix, and it ships as
  * LaTeX — the curation-relevant text is the prose, not the markup,
  * math bodies, or preamble. This is a deterministic single-pass
  * char walk (no regex backtracking on adversarial input) with a
  * DOCUMENTED subset, every rule chosen so a mistake drops markup or
  * drops math — never emits markup as prose:
  *
  *  - comments: unescaped `%` to end-of-line removed (`\%` is the
  *    literal percent, handled in the escape rule before the comment
  *    rule can see it)
  *  - math: `$…$`, `$$…$$`, `\(…\)`, `\[…\]` removed whole;
  *    unterminated math swallows the rest (prefix posture — trailing
  *    formulas are not prose)
  *  - environments: a drop set (equation/align/eqnarray/displaymath/
  *    math/figure/table/tabular/tikzpicture/verbatim/lstlisting, with
  *    `*` forms) removes body too, nesting-aware for the same name;
  *    every other `\begin`/`\end` drops only the markers (itemize,
  *    abstract, document … keep their prose), `\item` reads as a
  *    separator
  *  - commands whose argument IS prose (section/title/emph/textbf/…)
  *    contribute the argument: the command token and `[opts]` are
  *    skipped and the braces fall out via the group rule
  *  - commands whose argument is NOT prose (cite/ref/label/url/
  *    includegraphics/usepackage/documentclass/input/…) skip their
  *    `[opts]` and first braced group whole (`\href{url}{text}` thus
  *    keeps its text), newcommand/renewcommand skip two groups
  *  - character escapes `\% \& \_ \# \$ \{ \}` yield the literal;
  *    `~` is a space; `\\` a separator; unknown commands vanish and
  *    their braced text (if any) flows through as prose — the
  *    fail-open side of the trade, documented: an unknown semantic
  *    command's argument is more often prose than not
  *  - grouping braces vanish; all whitespace collapses to single
  *    spaces (the [[Warc.htmlText]] convention)
  *
  * Total function: any string in, text out, never a throw.
  *
  * Reference scope: kafi has no document-format surface; LLM-pipeline
  * extension breadth, sibling to [[Pdf]]/[[Docs]].
  */
object Latex {

  private val keepArg = Set(
    "section", "subsection", "subsubsection", "paragraph", "chapter",
    "title", "author", "date", "textbf", "textit", "textsc", "texttt",
    "emph", "underline", "mbox", "text", "caption", "footnote")
  private val dropWithArg = Set(
    "cite", "citep", "citet", "ref", "eqref", "pageref", "label",
    "includegraphics", "url", "usepackage", "documentclass", "input",
    "include", "vspace", "hspace", "bibliography", "bibliographystyle",
    "setlength", "graphicspath")
  private val dropTwoArgs = Set("newcommand", "renewcommand", "setcounter")
  private val dropEnvs = Set(
    "equation", "align", "eqnarray", "displaymath", "math", "figure",
    "table", "tabular", "tikzpicture", "verbatim", "lstlisting")

  private[graft] def latexText(src: String): String = {
    if (src == null) return ""
    val n = src.length
    val out = new java.lang.StringBuilder
    var i = 0

    def isLetter(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

    // skip one balanced {…} group starting at src(i)=='{'; returns the
    // index after the closing brace (or n if unbalanced — prefix rule)
    def skipGroup(from: Int): Int = {
      var j = from + 1
      var depth = 1
      while (j < n && depth > 0) {
        src.charAt(j) match {
          case '{' => depth += 1
          case '}' => depth -= 1
          case '\\' => if (j + 1 < n) j += 1 // escaped brace
          case _ => ()
        }
        j += 1
      }
      j
    }

    def skipOpts(from: Int): Int = {
      var j = from
      while (j < n && src.charAt(j) == '[') {
        while (j < n && src.charAt(j) != ']') j += 1
        if (j < n) j += 1
      }
      j
    }

    // the {env} name right after \begin / \end, or None
    def envName(from: Int): Option[(String, Int)] = {
      if (from < n && src.charAt(from) == '{') {
        val close = src.indexOf('}', from)
        if (close > from) return Some((src.substring(from + 1, close), close + 1))
      }
      None
    }

    // scan past the matching \end{env}, counting nested same-name begins
    def skipEnv(env: String, from: Int): Int = {
      val begin = s"\\begin{$env}"
      val end = s"\\end{$env}"
      var j = from
      var depth = 1
      while (j < n && depth > 0) {
        val nb = src.indexOf(begin, j)
        val ne = src.indexOf(end, j)
        if (ne < 0) return n // unterminated: swallow the rest
        if (nb >= 0 && nb < ne) { depth += 1; j = nb + begin.length }
        else { depth -= 1; j = ne + end.length }
      }
      j
    }

    // inline/display dollar math: from points AFTER the opening
    // delimiter; double=true means $$…$$
    def skipDollar(from: Int, double: Boolean): Int = {
      var j = from
      while (j < n) {
        if (src.charAt(j) == '\\') j += 2
        else if (src.charAt(j) == '$') {
          if (!double) return j + 1
          if (j + 1 < n && src.charAt(j + 1) == '$') return j + 2
          j += 1
        } else j += 1
      }
      n
    }

    def skipTo(pat: String, from: Int): Int = {
      val k = src.indexOf(pat, from)
      if (k < 0) n else k + pat.length
    }

    while (i < n) {
      val c = src.charAt(i)
      c match {
        case '%' =>
          while (i < n && src.charAt(i) != '\n') i += 1
        case '$' =>
          if (i + 1 < n && src.charAt(i + 1) == '$') i = skipDollar(i + 2, double = true)
          else i = skipDollar(i + 1, double = false)
        case '~' => out.append(' '); i += 1
        case '{' | '}' => i += 1
        case '\\' if i + 1 < n =>
          val d = src.charAt(i + 1)
          if (isLetter(d)) {
            var j = i + 1
            while (j < n && isLetter(src.charAt(j))) j += 1
            var name = src.substring(i + 1, j)
            if (j < n && src.charAt(j) == '*') { name += "*"; j += 1 }
            val base = name.stripSuffix("*")
            if (base == "begin") {
              envName(j) match {
                case Some((env, after)) =>
                  if (dropEnvs.contains(env.stripSuffix("*"))) i = skipEnv(env, after)
                  else { out.append(' '); i = after }
                case None => i = j
              }
            } else if (base == "end") {
              envName(j) match {
                case Some((_, after)) => out.append(' '); i = after
                case None => i = j
              }
            } else if (base == "item") {
              out.append(' '); i = skipOpts(j)
            } else if (keepArg.contains(base)) {
              out.append(' '); i = skipOpts(j) // braces fall out below
            } else if (dropTwoArgs.contains(base)) {
              var k = skipOpts(j)
              var g = 0
              while (g < 2 && k < n) {
                k = skipOpts(k)
                if (k < n && src.charAt(k) == '{') { k = skipGroup(k); g += 1 }
                else g = 2
              }
              out.append(' '); i = k
            } else if (dropWithArg.contains(base)) {
              var k = skipOpts(j)
              if (k < n && src.charAt(k) == '{') k = skipGroup(k)
              out.append(' '); i = k
            } else {
              out.append(' '); i = j // unknown command vanishes, args flow
            }
          } else {
            d match {
              case '%' | '&' | '_' | '#' | '$' | '{' | '}' => out.append(d); i += 2
              case '\\' => out.append(' '); i += 2
              case '[' => i = skipTo("\\]", i + 2)
              case '(' => i = skipTo("\\)", i + 2)
              case _ => out.append(' '); i += 2 // \, \; \! spacing etc.
            }
          }
        case '\\' => i += 1 // lone trailing backslash
        case _ => out.append(c); i += 1
      }
    }
    // collapse all whitespace to single spaces (htmlText convention)
    out.toString.split("[\\s ]+").filter(_.nonEmpty).mkString(" ")
  }

  /** (id, latex-source) rows → (id, text) — a pure map kernel. */
  def latexTexts(df: DataFrame, idCol: String, srcCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(srcCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, s) => (id, latexText(s)) })
      .toDF(idCol, "text")
  }
}
