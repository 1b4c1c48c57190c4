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

  // ------------------------------------------------------------------
  // Sitemaps (round 15) — the crawl FRONTIER side of the web-corpus
  // story: robots.txt names sitemaps ([[Crawl.parseRobots]] already
  // collects the `Sitemap:` lines), sitemaps name the URLs worth
  // fetching, and at scrape scale the urlset/sitemapindex walk decides
  // what enters the crawl queue before a single page is fetched. The
  // sitemaps.org protocol is small and structural: a `<urlset>` of
  // `<url>` entries (loc required; lastmod/changefreq/priority
  // optional) or a `<sitemapindex>` of `<sitemap>` entries (loc +
  // lastmod), capped at 50,000 entries per file, and routinely served
  // gzipped (.xml.gz) — all honored here. priority is carried as
  // INTEGER MILLIS (text-parsed, never a float round-trip); absent or
  // malformed optional fields degrade to ''/-1, never a throw.
  // ------------------------------------------------------------------

  /** One sitemap entry. `kind` is the root element (`urlset` |
    * `sitemapindex`); index entries carry no changefreq/priority. */
  case class SitemapUrl(doc_id: Long, url_idx: Int, kind: String,
      loc: String, lastmod: String, changefreq: String, priority_milli: Int)

  /** "0.8" → 800 by decimal-text arithmetic (pad/truncate the fraction
    * to 3 digits); absent/malformed → -1. The protocol range is
    * [0.0, 1.0]; out-of-range text parses by the same rule — honesty
    * over clamping, the consumer sees what the file said. */
  private[graft] def priorityMilli(s: String): Int = {
    if (s == null) return -1
    val t = s.trim
    if (t.isEmpty) return -1
    val dot = t.indexOf('.')
    val ip = if (dot < 0) t else t.substring(0, dot)
    val fp = if (dot < 0) "" else t.substring(dot + 1)
    if (ip.isEmpty && fp.isEmpty) return -1
    if (!ip.forall(_.isDigit) || !fp.forall(_.isDigit)) return -1
    val frac = (fp + "000").substring(0, 3)
    val ipv = if (ip.isEmpty) 0 else ip.toIntOption.getOrElse(return -1)
    if (ipv > 2000000) return -1 // overflow guard far past the legal 1.0
    ipv * 1000 + frac.toInt
  }

  private val MaxSitemapEntries = 50000

  /** Parse one sitemap document (plain or gzipped bytes). The root
    * element picks the entry shape; entries past the protocol's
    * 50,000 cap are dropped (the cap is part of the format — a file
    * past it is malformed, and a bounded walk is the scale posture
    * anyway). Unknown roots yield no rows. */
  private[graft] def parseSitemap(raw: Array[Byte]): Seq[(String, String, String, String, Int)] = {
    if (raw == null || raw.length < 2) return Nil
    val bytes =
      if ((raw(0) & 0xFF) == 0x1F && (raw(1) & 0xFF) == 0x8B)
        Warc.gunzipAll(raw).getOrElse(return Nil)
      else raw
    val xml = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val kind =
      if (xml.contains("<urlset")) "urlset"
      else if (xml.contains("<sitemapindex")) "sitemapindex"
      else return Nil
    val entryElem = if (kind == "urlset") "url" else "sitemap"
    inner(xml, entryElem).take(MaxSitemapEntries).flatMap { e =>
      first(e, "loc").map(Docs.xmlUnescape(_).trim).filter(_.nonEmpty).map { loc =>
        val lastmod = first(e, "lastmod").map(_.trim).getOrElse("")
        val (cf, pr) =
          if (kind == "urlset")
            (first(e, "changefreq").map(_.trim).getOrElse(""),
              priorityMilli(first(e, "priority").orNull))
          else ("", -1)
        (kind, loc, lastmod, cf, pr)
      }
    }
  }

  /** Sitemap blobs → frontier rows, the [[feedItems]] flatMap shape —
    * at crawl scale this is the slim pass that sizes the fetch queue. */
  def sitemapUrls(ds: Dataset[Media]): Dataset[SitemapUrl] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { m =>
      parseSitemap(m.media).zipWithIndex.map { case ((k, l, lm, cf, pr), i) =>
        SitemapUrl(m.doc_id, i, k, l, lm, cf, pr)
      }
    })
  }

  /** Sitemap fixture: a urlset (entries carry the optional fields per
    * the flags) or a sitemapindex; `gzipped` wraps the whole document
    * (the .xml.gz convention). */
  def syntheticSitemap(index: Boolean,
      entries: Seq[(String, String, String, String)], gzipped: Boolean): Array[Byte] = {
    def enc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
    val sb = new java.lang.StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8"?>""").append('\n')
    val (root, entry) = if (index) ("sitemapindex", "sitemap") else ("urlset", "url")
    sb.append(s"""<$root xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">""")
    entries.foreach { case (loc, lastmod, changefreq, priority) =>
      sb.append(s"<$entry><loc>${enc(loc)}</loc>")
      if (lastmod.nonEmpty) sb.append(s"<lastmod>$lastmod</lastmod>")
      if (!index && changefreq.nonEmpty)
        sb.append(s"<changefreq>$changefreq</changefreq>")
      if (!index && priority.nonEmpty)
        sb.append(s"<priority>$priority</priority>")
      sb.append(s"</$entry>")
    }
    sb.append(s"</$root>")
    val plain = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (!gzipped) plain
    else {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(plain); gz.close()
      bos.toByteArray
    }
  }
}
