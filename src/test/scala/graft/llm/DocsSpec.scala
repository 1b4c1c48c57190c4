package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** DOCX/EPUB extraction (round 13). Pins (a) the element-targeted
  * WordprocessingML semantics (run concatenation, tab/br, entities,
  * non-w:t text must NOT leak), (b) the OPF spine walk (order, decoy
  * exclusion, fallback), and (c) the corrupt-input posture over both
  * containers. */
class DocsSpec extends AnyFunSuite {

  // the q_docx_text fixture formulas, verbatim
  private def para(id: Long, k: Int): String = {
    val sep = if ((id + k) % 4 == 0) "\t" else " "
    s"P$k${sep}D$id & t=${(id * 5 + 3 * k) % 71}"
  }
  private def docxBytes(id: Long): Array[Byte] = {
    val paras = (0 until (2 + id % 3).toInt).map { k =>
      val t = para(id, k)
      val c1 = math.min(3, t.length)
      val c2 = math.min(c1 + 1 + ((id + k) % 5).toInt, t.length)
      Seq(t.substring(0, c1), t.substring(c1, c2), t.substring(c2))
    }
    Docs.syntheticDocx(paras, storedParts = id % 2 == 0)
  }

  test("docx text holds across the id sweep (runs, tabs, entities, zip methods)") {
    for (id <- 0L until 100L) {
      val exp = (0 until (2 + id % 3).toInt).map(para(id, _)).mkString("\n")
      assert(Docs.docxText(docxBytes(id)) == Some(exp), s"docx text at id=$id")
    }
  }

  test("wordprocessingml semantics: only w:t content, tabs/breaks, empty runs") {
    val xml =
      """<w:document><w:body>
        |<w:p><w:pPr><w:jc w:val="center"/></w:pPr>
        |  <w:r><w:t>Hel</w:t></w:r><w:r><w:t xml:space="preserve">lo </w:t></w:r>
        |  <w:r><w:instrText>PAGEREF _Toc1</w:instrText></w:r>
        |  <w:r><w:t>a&amp;b &lt;c&gt; &#65;&#x42;</w:t></w:r>
        |</w:p>
        |<w:p><w:r><w:t>x</w:t><w:tab/><w:t>y</w:t><w:br/><w:t>z</w:t></w:r></w:p>
        |<w:p><w:r><w:t/></w:r></w:p>
        |</w:body></w:document>""".stripMargin
    // instrText (field codes) must NOT leak — that is why the walk is
    // element-targeted, not a tag strip
    assert(Docs.wordXmlText(xml) == "Hello a&b <c> AB\nx\ty\nz\n")
    assert(Docs.wordXmlText("") == "")
    assert(Docs.wordXmlText("<w:p><w:t>no run wrap</w:t></w:p>") == "no run wrap")
  }

  test("epub spine walk: order, decoy exclusion, href resolution") {
    val chapters = Seq(
      ("a.xhtml", "<html><body><p>first &amp; a</p></body></html>"),
      ("b.xhtml", "<html><body><p>second</p></body></html>"),
      ("c.xhtml", "<html><body><p>third</p></body></html>"))
    val ep = Docs.syntheticEpub(chapters, Seq(2, 0, 1), Some("decoy.xhtml"))
    val got = Docs.epubChapters(ep)
    assert(got.map(_._1) == Seq("OEBPS/c.xhtml", "OEBPS/a.xhtml", "OEBPS/b.xhtml"),
      "spine order, not archive order; decoy absent")
    assert(Warc.htmlText(got.head._2) == "third")
  }

  test("epub fallback: a broken OPF chain degrades to archive-order parts") {
    // no container.xml: fall back to archive-order .xhtml/.html
    val zip = Archives.syntheticZip(Seq(
      ("x/one.xhtml", "<p>1</p>".getBytes("UTF-8"), false),
      ("notes.txt", "skip".getBytes("UTF-8"), true),
      ("x/two.html", "<p>2</p>".getBytes("UTF-8"), false)))
    assert(Docs.epubChapters(zip).map(_._1) == Seq("x/one.xhtml", "x/two.html"))
    // container points at a missing OPF: same fallback
    val zip2 = Archives.syntheticZip(Seq(
      ("META-INF/container.xml",
        """<container><rootfiles><rootfile full-path="gone.opf"/></rootfiles></container>"""
          .getBytes("UTF-8"), false),
      ("ch.xhtml", "<p>only</p>".getBytes("UTF-8"), false)))
    assert(Docs.epubChapters(zip2).map(_._1) == Seq("ch.xhtml"))
  }

  test("odt: nested spans kept, ODF whitespace elements reconstruct, sweep") {
    // the q_odt_text fixture formulas, verbatim
    for (id <- 0L until 100L) {
      val nP = (1 + id % 3).toInt
      val paras = (0 until nP).map { k =>
        val sep = if ((id + k) % 3 == 0) "\t" else "  "
        val t = s"O$k${sep}D$id & s=${(id * 7 + k) % 61}"
        Seq(t.substring(0, 2), t.substring(2))
      }
      val exp = paras.map(_.mkString).mkString("\n")
      assert(Docs.odtText(Docs.syntheticOdt(paras)) == Some(exp), s"odt text at id=$id")
    }
    // hand cases: text directly in p, nested bold inside span, n-space
    val xml = """<office:body><office:text>
      |<text:p>direct <text:span>sp<text:span>deep</text:span>an</text:span> end</text:p>
      |<text:p>a <text:s text:c="3"/>b&amp;c<text:tab/>d<text:line-break/>e</text:p>
      |</office:text></office:body>""".stripMargin
    assert(Docs.odtXmlText(xml) == "direct spdeepan end\na    b&c\td\ne")
    assert(Docs.odtText(Array[Byte](1, 2)) == None)
  }

  test("router: magic-byte detection and unified extraction") {
    val t = "Doc 9 body 27"
    val pdf = Pdf.syntheticPdf("1.4", _ => Seq(t), 1, 0, octalAll = false,
      flate = _ => true, filterArray = false, twoStreams = _ => false,
      indirectLength = false, outOfOrder = false, nested = false, encrypted = false)
    val docx = Docs.syntheticDocx(Seq(Seq(t)), storedParts = false)
    val epub = Docs.syntheticEpub(Seq(("c.xhtml", s"<p>$t</p>")), Seq(0), None)
    val mbox = Mail.syntheticMbox(Seq(Mail.syntheticMessage("a@x", "b@x", "s", t, 0, 0, false)))
    val html = s"<HTML><body>$t</body></HTML>".getBytes("UTF-8")
    val latex = s"\\documentclass{x}\n\\begin{document} $t \\end{document}".getBytes("UTF-8")
    val odt = Docs.syntheticOdt(Seq(Seq(t)))
    val rtf = Rtf.syntheticRtf(Seq(t), None)
    for ((b, f) <- Seq(pdf -> "pdf", docx -> "docx", epub -> "epub",
        mbox -> "mbox", html -> "html", latex -> "latex", odt -> "odt",
        rtf -> "rtf")) {
      assert(Docs.detectFormat(b) == f, s"detect $f")
      assert(Docs.extractAny(b) == Some((f, t)), s"extract $f")
    }
    // gzip peels exactly one layer
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos); gz.write(html); gz.close()
    assert(Docs.extractAny(bos.toByteArray) == Some(("html", t)))
    // a plain zip is a zip, not a docx/epub; junk is unknown
    val zip = Archives.syntheticZip(Seq(("a.txt", "x".getBytes, false)))
    assert(Docs.detectFormat(zip) == "zip")
    assert(Docs.extractAny(zip) == None)
    assert(Docs.detectFormat("random prose".getBytes) == "unknown")
    assert(Docs.extractAny(Array[Byte](9, 9, 9, 9)) == None)
  }

  test("corrupt input: never a throw, missing parts → None/Nil") {
    assert(Docs.docxText(Array[Byte](1, 2, 3)) == None)
    assert(Docs.docxText(Archives.syntheticZip(Seq(
      ("other.xml", "<a/>".getBytes("UTF-8"), false)))) == None)
    assert(Docs.epubChapters(Array.emptyByteArray) == Nil)
    // truncated zip: the central-directory walk's own posture applies
    val good = docxBytes(7L)
    for (cut <- Seq(10, good.length / 2, good.length - 4))
      Docs.docxText(java.util.Arrays.copyOfRange(good, 0, cut)) // must not throw
    val ep = Docs.syntheticEpub(Seq(("a.xhtml", "<p>x</p>")), Seq(0), None)
    for (cut <- Seq(10, ep.length / 2, ep.length - 4))
      Docs.epubChapters(java.util.Arrays.copyOfRange(ep, 0, cut)) // must not throw
  }
}
