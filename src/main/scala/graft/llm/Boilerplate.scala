package graft.llm

import org.apache.spark.sql.Dataset

import graft.llm.Multimodal.Media

/** Main-content extraction / boilerplate removal (round 13): the step
  * between "HTML out of the scrape" and "corpus text". [[Warc.htmlText]]
  * strips tags; it keeps navigation menus, footers, and link farms —
  * which at scrape scale are a large, highly-duplicated fraction of
  * every page and poison both dedup (every page on a site shares its
  * chrome) and quality scoring. The published extractors (jusText,
  * Pomikálek 2011; boilerpipe, Kohlschütter et al. WSDM 2010;
  * trafilatura) all reduce to the same deterministic core: segment the
  * page into text blocks at block-level tag boundaries and classify
  * each block by LENGTH, LINK DENSITY, and SEMANTIC CONTAINER context.
  * This is that core, kept exactly replayable (integer thresholds, no
  * floats, no language models) so the DuckDB oracle can pin every
  * block's features and verdict.
  *
  * Classification rule (documented contract, fixture-pinned):
  * a block is boilerplate when ANY of
  *  - any of its characters were gathered inside a `<nav>`, `<header>`,
  *    `<footer>`, or `<aside>` container (page chrome by declaration);
  *  - its collapsed text is shorter than `minChars`;
  *  - its anchor-text share exceeds `maxLinkPct` percent
  *    (link_chars * 100 > n_chars * maxLinkPct — integer compare).
  * Everything else is content. `<script>`/`<style>` bodies are removed
  * before the walk (never measured); comments likewise.
  *
  * Scale shape: a pure map/flatMap kernel over the page bytes already
  * in the scan — the same contract as [[Warc]]: nothing shuffles until
  * the caller keys on something, and classification is per-block local
  * (no cross-page state), so the operator is embarrassingly parallel
  * at any corpus size.
  *
  * Reference scope: kafi has no HTML surface; LLM-pipeline extension
  * breadth, the quality tail of the [[Warc]] ingestion head.
  */
object Boilerplate {

  /** One text block: `ctx_dropped` = gathered (partly) inside page
    * chrome; `is_content` = the classification verdict. */
  case class Block(doc_id: Long, block_idx: Int, text: String,
      n_chars: Int, link_chars: Int, ctx_dropped: Boolean, is_content: Boolean)

  private val ReComment = java.util.regex.Pattern.compile("<!--.*?-->",
    java.util.regex.Pattern.DOTALL)
  private val ReScript = java.util.regex.Pattern.compile(
    "<(script|style)\\b[^>]*>.*?</\\1\\s*>",
    java.util.regex.Pattern.DOTALL | java.util.regex.Pattern.CASE_INSENSITIVE)
  private val ReTag = java.util.regex.Pattern.compile("<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>]*>")

  /** Tags whose open OR close cuts a block boundary. Inline tags
    * (`<a>`, `<b>`, `<span>`, …) deliberately absent: a link inside a
    * paragraph is the paragraph's link density, not its own block. */
  private val flushTags = Set(
    "p", "div", "td", "th", "li", "dd", "dt", "blockquote", "pre",
    "h1", "h2", "h3", "h4", "h5", "h6", "article", "section", "main",
    "table", "tr", "ul", "ol", "dl", "form", "figure", "figcaption",
    "html", "head", "body", "title", "br", "hr",
    "nav", "header", "footer", "aside")

  /** Semantic chrome containers: any text inside is boilerplate. */
  private val dropTags = Set("nav", "header", "footer", "aside")

  /** Block walk. Total and deterministic: any string in, blocks out;
    * unbalanced close tags floor the context depth at 0, an unclosed
    * container drops the rest of the page (degrade, never throw). */
  private[graft] def blocks(html: String, minChars: Int = 25,
      maxLinkPct: Int = 40): Seq[Block] = {
    if (html == null) return Nil
    var s = ReComment.matcher(html).replaceAll(" ")
    s = ReScript.matcher(s).replaceAll(" ")
    val out = Seq.newBuilder[Block]
    val text = new java.lang.StringBuilder
    val link = new java.lang.StringBuilder
    var ctxDepth = 0
    var aDepth = 0
    var touchedCtx = false
    var idx = 0
    def flush(): Unit = {
      val t = Warc.collapseWs(Warc.decodeEntities(text.toString))
      if (t.nonEmpty) {
        val l = Warc.collapseWs(Warc.decodeEntities(link.toString))
        val content = !touchedCtx && t.length >= minChars &&
          l.length.toLong * 100 <= t.length.toLong * maxLinkPct
        out += Block(-1L, idx, t, t.length, l.length, touchedCtx, content)
        idx += 1
      }
      text.setLength(0); link.setLength(0)
      touchedCtx = ctxDepth > 0
    }
    val m = ReTag.matcher(s)
    var last = 0
    while (m.find()) {
      val seg = s.substring(last, m.start())
      if (seg.nonEmpty) {
        text.append(seg)
        if (aDepth > 0) link.append(seg)
        if (ctxDepth > 0) touchedCtx = true
      }
      val closing = m.group(1).nonEmpty
      val name = m.group(2).toLowerCase
      if (name == "a") {
        if (closing) aDepth = math.max(0, aDepth - 1) else aDepth += 1
      }
      if (flushTags.contains(name)) flush()
      if (dropTags.contains(name)) {
        if (closing) ctxDepth = math.max(0, ctxDepth - 1) else ctxDepth += 1
        touchedCtx = ctxDepth > 0
      }
      last = m.end()
    }
    val tail = s.substring(last)
    if (tail.nonEmpty) {
      text.append(tail)
      if (aDepth > 0) link.append(tail)
      if (ctxDepth > 0) touchedCtx = true
    }
    flush()
    out.result()
  }

  /** The kept text: content blocks joined by single spaces. */
  private[graft] def mainText(html: String, minChars: Int = 25,
      maxLinkPct: Int = 40): String =
    blocks(html, minChars, maxLinkPct).filter(_.is_content).map(_.text).mkString(" ")

  /** HTML blobs → classified block rows, a pure flatMap kernel. */
  def htmlBlocks(ds: Dataset[Media], minChars: Int = 25,
      maxLinkPct: Int = 40): Dataset[Block] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { m =>
      blocks(new String(m.media, java.nio.charset.StandardCharsets.UTF_8),
        minChars, maxLinkPct).map(b => b.copy(doc_id = m.doc_id))
    })
  }

  /** HTML blobs → (doc_id, main_text), a pure map kernel. */
  def mainContent(ds: Dataset[Media], minChars: Int = 25,
      maxLinkPct: Int = 40): Dataset[(Long, String)] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map(m => (m.doc_id,
      mainText(new String(m.media, java.nio.charset.StandardCharsets.UTF_8),
        minChars, maxLinkPct)))
  }
}
