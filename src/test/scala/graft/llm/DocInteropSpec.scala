package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Independent cross-validation of the text-format walks against the
  * JDK's OWN parsers (the MediaInteropSpec posture: our reader vs a
  * second implementation we didn't write — a shared transcription
  * error cannot cancel):
  *
  *  - RTF vs javax.swing.text.rtf.RTFEditorKit — full fidelity
  *    including non-ASCII \'hh code-page bytes and \uN? unicode
  *    escapes with their fallback chars;
  *  - DOCX/ODT/sitemap/feed/OPF XML walks vs javax.xml DOM parsing —
  *    our regex/char walks must agree with a real XML parser on the
  *    same documents.
  */
class DocInteropSpec extends AnyFunSuite {

  private def collapse(s: String): String =
    s.split("\\s+").filter(_.nonEmpty).mkString(" ")

  private def kitRtf(rtf: Array[Byte]): String = {
    val kit = new javax.swing.text.rtf.RTFEditorKit()
    val doc = kit.createDefaultDocument()
    kit.read(new java.io.ByteArrayInputStream(rtf), doc, 0)
    doc.getText(0, doc.getLength)
  }

  private def dom(xml: String): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(
      xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  private def elems(d: org.w3c.dom.Document, tag: String): Seq[org.w3c.dom.Element] = {
    val nl = d.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  test("rtf: our walk equals RTFEditorKit (escapes included)") {
    // fixture-shaped docs (tables, info, ignorable group, nested bold,
    // ASCII hex escapes, brace escapes) — both readers, collapsed
    for (id <- 0L until 40L) {
      val paras = (0 until (1 + id % 3).toInt).map(k =>
        s"P$k d$id pct 50 {x} end ${(id * 3 + k) % 71}")
      val bytes = Rtf.syntheticRtf(paras, None)
      val ours = Rtf.rtfText(new String(bytes, "ISO-8859-1"))
      val kits = collapse(kitRtf(bytes))
      assert(ours == kits, s"rtf interop at id=$id")
    }
    // escapes through both readers: ASCII and non-ASCII \'hh (the
    // ansi/cp1252 default agrees with Latin-1 at 0xE9) and the \uN?
    // form with its fallback char
    for (doc <- Seq("{\\rtf1 pct 50\\'25 amp \\'26 done\\par}",
        "{\\rtf1 caf\\'e9 x\\par}",
        "{\\rtf1 dash \\u8212? end\\par}")) {
      val bytes = doc.getBytes("ISO-8859-1")
      assert(Rtf.rtfText(new String(bytes, "ISO-8859-1")) == collapse(kitRtf(bytes)),
        s"rtf escape interop on $doc")
    }
    // the unicode fixture paragraph end-to-end
    val uni = Rtf.syntheticRtf(Seq("plain"), Some("Café — d7"))
    assert(Rtf.rtfText(new String(uni, "ISO-8859-1")) == collapse(kitRtf(uni)))
  }

  test("docx: our element walk equals a DOM walk of the same part") {
    for (id <- 0L until 30L) {
      val paras = (0 until (2 + id % 3).toInt).map { k =>
        val t = s"P$k D$id & t=${(id * 5 + 3 * k) % 71}"
        Seq(t.substring(0, math.min(3, t.length)), t.substring(math.min(3, t.length)))
      }
      val zip = Docs.syntheticDocx(paras, storedParts = id % 2 == 0)
      val xml = Archives.parseZip(zip).find(_.name == "word/document.xml").get.content
      val d = dom(xml)
      val domText = elems(d, "w:p").map { p =>
        val sb = new StringBuilder
        def walk(n: org.w3c.dom.Node): Unit = {
          n.getNodeName match {
            case "w:t" => sb ++= n.getTextContent
            case "w:tab" => sb += '\t'
            case "w:br" => sb += '\n'
            case _ =>
              val ch = n.getChildNodes
              (0 until ch.getLength).foreach(i => walk(ch.item(i)))
          }
        }
        walk(p)
        sb.toString
      }.mkString("\n")
      assert(Docs.wordXmlText(xml) == domText, s"docx interop at id=$id")
    }
  }

  test("odt: our paragraph walk equals a DOM walk") {
    for (id <- 0L until 30L) {
      val paras = (0 until (1 + id % 3).toInt).map { k =>
        val t = s"O$k  D$id & s=${(id * 7 + k) % 61}\tz"
        Seq(t.substring(0, 2), t.substring(2))
      }
      val zip = Docs.syntheticOdt(paras)
      val xml = Archives.parseZip(zip).find(_.name == "content.xml").get.content
      val d = dom(xml)
      val domText = elems(d, "text:p").map { p =>
        val sb = new StringBuilder
        def walk(n: org.w3c.dom.Node): Unit = {
          n.getNodeType match {
            case org.w3c.dom.Node.TEXT_NODE => sb ++= n.getNodeValue
            case org.w3c.dom.Node.ELEMENT_NODE =>
              n.getNodeName match {
                case "text:tab" => sb += '\t'
                case "text:line-break" => sb += '\n'
                case "text:s" =>
                  val e = n.asInstanceOf[org.w3c.dom.Element]
                  val c = Option(e.getAttribute("text:c")).filter(_.nonEmpty)
                    .flatMap(_.toIntOption).getOrElse(1)
                  sb ++= " " * c
                case _ =>
                  val ch = n.getChildNodes
                  (0 until ch.getLength).foreach(i => walk(ch.item(i)))
              }
            case _ => ()
          }
        }
        walk(p)
        sb.toString
      }.mkString("\n")
      assert(Docs.odtXmlText(xml) == domText, s"odt interop at id=$id")
    }
  }

  test("sitemap and feed walks equal DOM field extraction") {
    for (id <- 0L until 30L) {
      val urls = (0 until (1 + id % 3).toInt).map(i =>
        (s"https://e/$id/p$i?a=1&b=${(id + i) % 7}",
          if ((id + i) % 3 == 0) "" else "2026-01-02",
          if ((id + i) % 2 == 0) Some(0.25) else None))
      val xml = new String(Crawl.syntheticSitemap(index = false, urls), "UTF-8")
      val d = dom(xml)
      val domUrls = elems(d, "url").map { u =>
        def f(t: String) = {
          val nl = u.getElementsByTagName(t)
          if (nl.getLength > 0) nl.item(0).getTextContent else ""
        }
        (f("loc"), f("lastmod"), f("changefreq"),
          Option(f("priority")).filter(_.nonEmpty).flatMap(_.toDoubleOption).getOrElse(0.5), 0)
      }
      assert(Crawl.parseSitemap(xml) == domUrls, s"sitemap interop at id=$id")

      val items = (0 until (1 + id % 2).toInt).map(i =>
        (s"T $id $i & co", s"https://l/$id/$i", s"<p>b $id.$i &amp; x</p>"))
      val feedXml = new String(Feeds.syntheticFeed(atom = id % 2 == 1, items,
        i => (id + i) % 2 == 0), "UTF-8")
      val fd = dom(feedXml)
      val itemTag = if (id % 2 == 1) "entry" else "item"
      val domItems = elems(fd, itemTag).map { it =>
        val title = it.getElementsByTagName("title").item(0).getTextContent
        // DOM gives the DECODED text content incl. CDATA — apply the
        // same HTML tail our payloadText ends with
        Warc.htmlText(title)
      }
      assert(Feeds.parseFeed(feedXml).map(_._2) == domItems, s"feed title interop at id=$id")
    }
  }

  test("epub: our OPF spine walk equals DOM spine resolution") {
    for (id <- 0L until 20L) {
      val n = (1 + id % 3).toInt
      val chapters = (0 until n).map(k => (s"c$k.xhtml", s"<p>ch $k of $id</p>"))
      val spine = if (id % 2 == 0) (0 until n) else (0 until n).reverse
      val zip = Docs.syntheticEpub(chapters, spine, Some("decoy.xhtml"))
      val byName = Archives.parseZip(zip).map(e => e.name -> e.content).toMap
      val container = dom(byName("META-INF/container.xml"))
      val opfPath = elems(container, "rootfile").head.getAttribute("full-path")
      val opf = dom(byName(opfPath))
      val manifest = elems(opf, "item").map(e => e.getAttribute("id") -> e.getAttribute("href")).toMap
      val domOrder = elems(opf, "itemref").map(e => "OEBPS/" + manifest(e.getAttribute("idref")))
      assert(Docs.epubChapters(zip).map(_._1) == domOrder, s"epub interop at id=$id")
    }
  }
}
