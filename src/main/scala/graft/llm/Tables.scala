package graft.llm

import org.apache.spark.sql.Dataset

import graft.llm.Multimodal.Media

/** HTML table extraction (round 13): web tables are their own corpus
  * modality (relational pretraining data, table-QA sets — the WDC Web
  * Table Corpus is extracted exactly this way) and a table flattened
  * through a tag-stripper is word soup. The walk emits one row per
  * CELL with its (table, row, col) coordinates, header flag (`<th>`),
  * and the shared-htmlText cell text, honoring `colspan` in the
  * column arithmetic (a spanned cell advances col_idx by its span;
  * `rowspan` is NOT expanded into later rows — documented scope, the
  * usual web-table-corpus simplification).
  *
  * Pure flatMap kernel over page bytes; nested tables contribute
  * their cells to the INNER table only (the outer row that wraps a
  * nested table keeps its other cells — the inner `<table>` region is
  * cut out of the outer walk first).
  */
object Tables {

  case class TableCell(doc_id: Long, table_idx: Int, row_idx: Int,
      col_idx: Int, is_header: Boolean, text: String)

  private val ReRow = java.util.regex.Pattern.compile(
    "<tr\\b[^>]*>(.*?)</tr\\s*>",
    java.util.regex.Pattern.DOTALL | java.util.regex.Pattern.CASE_INSENSITIVE)
  private val ReCell = java.util.regex.Pattern.compile(
    "<(td|th)\\b([^>]*)>(.*?)</\\1\\s*>",
    java.util.regex.Pattern.DOTALL | java.util.regex.Pattern.CASE_INSENSITIVE)
  private val ReColspan = java.util.regex.Pattern.compile(
    "colspan\\s*=\\s*[\"']?(\\d+)", java.util.regex.Pattern.CASE_INSENSITIVE)

  /** Innermost-table regions: repeatedly take the FIRST `</table` and
    * pair it with the LAST `<table` before it — that pair brackets an
    * innermost region (a reluctant regex would pair an outer open with
    * an inner close). The region is cut out and the scan repeats, so
    * sibling tables emerge in document order and nested ones
    * inner-first. Stray closes are dropped; an unclosed table never
    * emits (prefix posture).
    *
    * Cost: the page is lowercased ONCE; the original and lowercase
    * buffers are deleted in lockstep, so each iteration is linear in
    * the remaining text, not a fresh full-page toLowerCase (a
    * many-table page was quadratic before round 14). A page with more
    * than 4096 table regions truncates at the guard — an explicit
    * adversarial-input bound (no real document has thousands of
    * tables; a crafted one must not pin a task), documented per the
    * no-silent-caps posture. */
  private def tableRegions(html: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new java.lang.StringBuilder(html)
    // per-char lowering: String.toLowerCase can CHANGE LENGTH for some
    // code points (U+0130 → "i̇"), which would break lockstep deletes;
    // Character.toLowerCase is 1:1 and ASCII tags only need that much
    val lowSb = new java.lang.StringBuilder(html.length)
    var li = 0
    while (li < html.length) { lowSb.append(Character.toLowerCase(html.charAt(li))); li += 1 }
    var guard = 0
    var go = true
    while (go && guard < 4096) {
      val close = lowSb.indexOf("</table")
      if (close < 0) go = false
      else {
        val closeEnd = { val g = lowSb.indexOf(">", close); if (g < 0) lowSb.length else g + 1 }
        val open = lowSb.lastIndexOf("<table", close)
        val openValid = open >= 0 && (open + 6 >= lowSb.length ||
          lowSb.charAt(open + 6) == '>' || Character.isWhitespace(lowSb.charAt(open + 6)))
        if (!openValid) { sb.delete(close, closeEnd); lowSb.delete(close, closeEnd) }
        else {
          val bodyStart = { val g = lowSb.indexOf(">", open); if (g < 0) close else g + 1 }
          if (bodyStart <= close) out += sb.substring(bodyStart, close)
          sb.delete(open, closeEnd); lowSb.delete(open, closeEnd)
        }
      }
      guard += 1
    }
    out.result()
  }

  /** One page → cell rows. Total; tag soup degrades to fewer cells. */
  private[graft] def parseTables(html: String): Seq[TableCell] = {
    if (html == null) return Nil
    val out = Seq.newBuilder[TableCell]
    tableRegions(html).zipWithIndex.foreach { case (t, ti) =>
      val rm = ReRow.matcher(t)
      var ri = 0
      while (rm.find()) {
        val cm = ReCell.matcher(rm.group(1))
        var ci = 0
        while (cm.find()) {
          val header = cm.group(1).equalsIgnoreCase("th")
          val spanM = ReColspan.matcher(cm.group(2))
          val span = if (spanM.find()) math.max(1, spanM.group(1).toInt) else 1
          out += TableCell(-1L, ti, ri, ci, header, Warc.htmlText(cm.group(3)))
          ci += span
        }
        ri += 1
      }
    }
    out.result()
  }

  /** Page blobs → cell rows, a pure flatMap kernel. */
  def tableCells(ds: Dataset[Media]): Dataset[TableCell] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { m =>
      parseTables(new String(m.media, java.nio.charset.StandardCharsets.UTF_8))
        .map(c => c.copy(doc_id = m.doc_id))
    })
  }
}
