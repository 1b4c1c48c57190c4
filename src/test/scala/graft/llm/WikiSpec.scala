package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** MediaWiki dump walk + wikitext extraction (round 13). The dump walk
  * is cross-validated against javax.xml DOM parsing of the same bytes
  * (an independent second implementation, the DocInteropSpec pattern),
  * and the compression layer against the JDK/commons-compress codecs
  * the fixture writes with.
  */
class WikiSpec extends AnyFunSuite {

  private val msPages = (0 until 7).map(i =>
    (s"T $i:colon", 0, 100L + i, "", s"body $i"))

  test("multistream index: offsets real, titles keep their colons") {
    val (dumpB, indexB) = Wiki.syntheticMultistreamIndexed(msPages, 3)
    val idx = Wiki.parseIndex(indexB)
    assert(idx.length === 7)
    assert(idx.map(_._2) === (100L to 106L))
    assert(idx.map(_._3) === msPages.map(_._1), "first-two-colons rule")
    // offsets are REAL stream positions: each distinct offset starts 'BZh'
    idx.map(_._1).distinct.foreach { off =>
      assert(dumpB(off.toInt) === 'B'.toByte && dumpB(off.toInt + 1) === 'Z'.toByte)
    }
    // page i → stream i*3/7: chunks of 3, 2, 2
    val ranges = Wiki.sliceRanges(idx, dumpB.length.toLong)
    assert(ranges.length === 3)
    assert(idx.groupBy(_._1).view.mapValues(_.length).values.toSeq.sorted === Seq(2, 2, 3))
    // corrupt index lines skip, never throw
    assert(Wiki.parseIndex("x:y\n12:34:ok\n:::\n9:9".getBytes("UTF-8"))
      === Seq((12L, 34L, "ok")))
    assert(Wiki.parseIndex(Array[Byte]('B', 'Z', 'h', 0, 1)) === Nil)
    assert(Wiki.parseIndex(null) === Nil)
  }

  test("multistream slices: per-slice decode equals the whole-dump walk") {
    val (dumpB, indexB) = Wiki.syntheticMultistreamIndexed(msPages, 3)
    val whole = Wiki.parseDump(dumpB)
    assert(whole.map(_.page_id) === (100L to 106L))
    val sliced = Wiki.pagesBySlice(dumpB, indexB)
    assert(sliced.map(_._2.page_id).sorted === whole.map(_.page_id))
    assert(sliced.map { case (si, p) => (si, p.title, p.text) }.toSet ===
      msPages.zipWithIndex.map { case ((t, _, _, _, txt), i) =>
        (i * 3 / 7, t, txt) }.toSet)
    // every slice is independently decodable — no slice sees the root
    val ranges = Wiki.sliceRanges(Wiki.parseIndex(indexB), dumpB.length.toLong)
    ranges.foreach { case (o, l) =>
      val ps = Wiki.parseDump(java.util.Arrays.copyOfRange(dumpB, o.toInt, (o + l).toInt))
      assert(ps.nonEmpty)
    }
  }

  private def dump(compress: Int) = Wiki.syntheticDump(Seq(
    ("Alpha & Beta", 0, 11L, "", "Body '''one''' & more"),
    ("Talk:Alpha", 1, 12L, "", ""),
    ("Redir", 0, 13L, "Alpha & Beta", "#REDIRECT [[Alpha & Beta]]"),
    ("Help:X", 12, 14L, "", "plain")), compress)

  test("dump walk: titles, ns, ids, redirect, empty text, entities") {
    val pages = Wiki.parseDump(dump(0))
    assert(pages.length == 4)
    assert(pages.map(_.title) == Seq("Alpha & Beta", "Talk:Alpha", "Redir", "Help:X"))
    assert(pages.map(_.ns) == Seq(0, 1, 0, 12))
    assert(pages.map(_.page_id) == Seq(11L, 12L, 13L, 14L))
    assert(pages.map(_.redirect) == Seq("", "", "Alpha & Beta", ""))
    assert(pages(1).text == "") // self-closing <text/>
    assert(pages(0).text == "Body '''one''' & more")
    assert(pages(0).timestamp == "2026-01-02T03:04:05Z")
    // the revision <id> (page_id*7+1) must not shadow the page <id>
    assert(!pages.map(_.page_id).contains(11L * 7 + 1))
  }

  test("compression: gzip and bz2 multistream land on the plain walk") {
    val plain = Wiki.parseDump(dump(0))
    assert(Wiki.parseDump(dump(1)) == plain)
    assert(Wiki.parseDump(dump(2)) == plain) // stream boundary mid-document
  }

  test("dump walk cross-validated against javax.xml DOM") {
    val xml = new String(dump(0), "UTF-8")
    val db = javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
    val doc = db.parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    val nodes = doc.getElementsByTagName("page")
    val ours = Wiki.parseDump(dump(0))
    assert(nodes.getLength == ours.length)
    (0 until nodes.getLength).foreach { i =>
      val e = nodes.item(i).asInstanceOf[org.w3c.dom.Element]
      def first(tag: String): Option[org.w3c.dom.Element] = {
        val l = e.getElementsByTagName(tag)
        if (l.getLength > 0) Some(l.item(0).asInstanceOf[org.w3c.dom.Element]) else None
      }
      assert(first("title").get.getTextContent == ours(i).title)
      assert(first("ns").get.getTextContent.trim.toInt == ours(i).ns)
      assert(first("id").get.getTextContent.trim.toLong == ours(i).page_id)
      assert(first("redirect").map(_.getAttribute("title")).getOrElse("") == ours(i).redirect)
      assert(first("text").map(_.getTextContent).getOrElse("") == ours(i).text)
    }
  }

  test("corrupt input never throws: garbage, truncations, bad compression") {
    assert(Wiki.parseDump(null).isEmpty)
    assert(Wiki.parseDump(Array[Byte](1, 2, 3)).isEmpty)
    assert(Wiki.parseDump("no pages here".getBytes).isEmpty)
    val gz = dump(1); val bz = dump(2)
    (1 until gz.length by 7).foreach(k => Wiki.parseDump(gz.take(k)))
    (1 until bz.length by 7).foreach(k => Wiki.parseDump(bz.take(k)))
    // a page missing its id is skipped, the walk continues
    val broken = ("<page><title>NoId</title><ns>0</ns></page>" +
      "<page><title>Ok</title><ns>0</ns><id>7</id></page>").getBytes("UTF-8")
    val p = Wiki.parseDump(broken)
    assert(p.map(_.title) == Seq("Ok") && p.head.page_idx == 0)
  }

  test("wikitext: templates, tables, links, refs, headings, lists") {
    assert(Wiki.wikitextToText("{{a|{{b}}}}x") == "x")
    assert(Wiki.wikitextToText("{| class=x\n|-\n| c\n|}done") == "done")
    assert(Wiki.wikitextToText("[[Page]]") == "Page")
    assert(Wiki.wikitextToText("[[target|label]]") == "label")
    // multi-pipe non-file link renders everything after the FIRST pipe
    // (MediaWiki's rule; round 14 — lastPipe would have given just "c")
    assert(Wiki.wikitextToText("[[a|b|c]]") == "b|c")
    assert(Wiki.wikitextToText("[[File:x.png|thumb|cap [[in]]]]y") == "y")
    assert(Wiki.wikitextToText("[[Category:C]]z") == "z")
    assert(Wiki.wikitextToText("[[image:u.jpg|a|b]]w") == "w")
    assert(Wiki.wikitextToText("a<ref>x</ref>b") == "a b")
    assert(Wiki.wikitextToText("a<ref name=\"n\" />b") == "a b")
    assert(Wiki.wikitextToText("== T ==") == "T")
    assert(Wiki.wikitextToText("=== T$ ===") == "T$")
    assert(Wiki.wikitextToText("'''b''' ''i'' '''''bi'''''") == "b i bi")
    assert(Wiki.wikitextToText("* a\n# b\n; c\n: d") == "a b c d")
    assert(Wiki.wikitextToText("x\n----\ny") == "x y")
    assert(Wiki.wikitextToText("[https://u lab el] [https://bare]") == "lab el")
    assert(Wiki.wikitextToText("&amp; &lt;tag&gt;") == "& <tag>")
    assert(Wiki.wikitextToText("<!-- {{unbalanced [[ -->ok") == "ok")
    // a label revealed by one link pass can itself hold a link
    assert(Wiki.wikitextToText("[[a|x [[b]] y]]") == "x b y")
  }

  test("wikitext degrades, never throws: unbalanced everything") {
    assert(Wiki.wikitextToText(null) == "")
    assert(Wiki.wikitextToText("{{never closed") == "")
    assert(Wiki.wikitextToText("pre {| never") == "pre")
    assert(Wiki.wikitextToText("[[never closed") == "[[never closed")
    assert(Wiki.wikitextToText("a ]] b }} c |}") == "a ]] b }} c |}")
  }
}
