package graft.llm

import org.apache.spark.sql.Dataset

import graft.llm.Multimodal.Media

/** Syndication-feed ingestion (round 13): news/blog corpora arrive as
  * RSS 2.0 and Atom feeds. Both are structural XML; the text payload
  * (description/summary/content) is HTML — routinely CDATA-wrapped —
  * so the extraction tail is [[Warc.htmlText]] after CDATA unwrap and
  * entity decode. Format detection is the root element; item fields
  * differ (`<link>` text vs `<link href=>`), which the walk carries
  * explicitly rather than papering over.
  *
  * Reference scope: kafi has no feed surface; LLM-pipeline extension
  * breadth, sibling to [[Warc]].
  */
object Feeds {

  case class FeedItem(doc_id: Long, item_idx: Int, fmt: String,
      title: String, link: String, text: String)

  private def inner(xml: String, elem: String): Seq[String] = {
    val m = java.util.regex.Pattern
      .compile(s"<$elem(?:\\s[^>]*)?>(.*?)</$elem>", java.util.regex.Pattern.DOTALL)
      .matcher(xml)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group(1)
    out.result()
  }

  private def first(xml: String, elem: String): Option[String] =
    inner(xml, elem).headOption

  private val ReCdata = java.util.regex.Pattern.compile(
    "<!\\[CDATA\\[(.*?)\\]\\]>", java.util.regex.Pattern.DOTALL)

  /** Feed text payloads are DOUBLE-layered: the XML layer entity-
    * encodes the value (the RSS escaped-HTML convention), and the
    * decoded value is itself HTML. So: XML entity decode per
    * non-CDATA stretch (CDATA content is raw by definition — no
    * decode inside), then ONE HTML pass (tags, HTML entities,
    * whitespace) over the rebuilt string. Both conventions land on
    * identical text — the fixture alternates them to prove it. */
  private[graft] def payloadText(raw: String): String = {
    if (!raw.contains("<![CDATA[")) return Warc.htmlText(Docs.xmlUnescape(raw))
    val out = new java.lang.StringBuilder
    val m = ReCdata.matcher(raw)
    var p = 0
    while (m.find()) {
      out.append(Docs.xmlUnescape(raw.substring(p, m.start())))
      out.append(m.group(1))
      p = m.end()
    }
    out.append(Docs.xmlUnescape(raw.substring(p)))
    Warc.htmlText(out.toString)
  }

  /** One feed → items. RSS: `<item>` with text `<link>`; Atom:
    * `<entry>` with `<link href="…"/>`, summary else content. */
  private[graft] def parseFeed(xml: String): Seq[(String, String, String, String)] = {
    if (xml == null) return Nil
    val isAtom = xml.contains("<feed")
    if (isAtom && xml.contains("<entry")) {
      inner(xml, "entry").map { e =>
        val title = first(e, "title").map(payloadText).getOrElse("")
        val link = {
          val m = java.util.regex.Pattern
            .compile("""<link\b[^>]*\bhref\s*=\s*["']([^"']*)["']""").matcher(e)
          if (m.find()) m.group(1) else ""
        }
        val body = first(e, "summary").orElse(first(e, "content")).getOrElse("")
        ("atom", title, link, payloadText(body))
      }
    } else if (xml.contains("<rss") || xml.contains("<channel")) {
      inner(xml, "item").map { it =>
        val title = first(it, "title").map(payloadText).getOrElse("")
        val link = first(it, "link").map(_.trim).getOrElse("")
        val body = first(it, "description").getOrElse("")
        ("rss", title, link, payloadText(body))
      }
    } else Nil
  }

  /** Feed blobs → item rows, a pure flatMap kernel. */
  def feedItems(ds: Dataset[Media]): Dataset[FeedItem] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { m =>
      parseFeed(new String(m.media, java.nio.charset.StandardCharsets.UTF_8))
        .zipWithIndex.map { case ((fmt, t, l, x), i) => FeedItem(m.doc_id, i, fmt, t, l, x) }
    })
  }

  /** RSS 2.0 or Atom fixture; `cdata(i)` wraps item i's body in a
    * CDATA section (raw HTML inside), otherwise the body is
    * entity-encoded XML — both must land on the same extracted
    * text. */
  def syntheticFeed(atom: Boolean, items: Seq[(String, String, String)],
      cdata: Int => Boolean): Array[Byte] = {
    def enc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sb = new java.lang.StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8"?>""").append('\n')
    if (atom) {
      sb.append("""<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>""")
      items.zipWithIndex.foreach { case ((title, link, bodyHtml), i) =>
        sb.append("<entry>")
        sb.append(s"<title>${enc(title)}</title>")
        sb.append(s"""<link rel="alternate" href="$link"/>""")
        sb.append("<updated>2026-01-01T00:00:00Z</updated>")
        val body = if (cdata(i)) s"<![CDATA[$bodyHtml]]>" else enc(bodyHtml)
        sb.append(s"<summary>$body</summary>")
        sb.append("</entry>")
      }
      sb.append("</feed>")
    } else {
      sb.append("""<rss version="2.0"><channel><title>F</title>""")
      items.zipWithIndex.foreach { case ((title, link, bodyHtml), i) =>
        sb.append("<item>")
        sb.append(s"<title>${enc(title)}</title>")
        sb.append(s"<link>$link</link>")
        sb.append("<pubDate>Thu, 01 Jan 2026 00:00:00 GMT</pubDate>")
        val body = if (cdata(i)) s"<![CDATA[$bodyHtml]]>" else enc(bodyHtml)
        sb.append(s"<description>$body</description>")
        sb.append("</item>")
      }
      sb.append("</channel></rss>")
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

}
