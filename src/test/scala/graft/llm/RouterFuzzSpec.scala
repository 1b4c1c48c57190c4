package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Router-level adversarial inputs (round 14, VERDICT r13 task 7): the
  * document router now fronts 8 formats, so MISROUTING — not just
  * mis-parsing — must be under test. Every case here is a blob whose
  * prefix claims one format while its body belongs to another, or
  * whose container carries conflicting markers: the contract is that
  * (a) detection is deterministic and follows the documented
  * precedence, (b) the winning extractor DEGRADES on the alien body
  * (fewer/empty rows), and (c) nothing ever throws or routes to the
  * body's format on the strength of the body alone. */
class RouterFuzzSpec extends AnyFunSuite {

  private def utf8(s: String) = s.getBytes("UTF-8")

  test("magic-prefix wins: pdf header with rtf body, rtf header with pdf body") {
    val pdfRtf = utf8("%PDF-1.4\n{\\rtf1 body words here}\n%%EOF")
    assert(Docs.detectFormat(pdfRtf) === "pdf")
    val out = Docs.extractAny(pdfRtf)
    assert(out.forall(_._1 == "pdf"), "must not fall through to rtf")
    val rtfPdf = utf8("{\\rtf1 leading} %PDF-1.4 1 0 obj endobj")
    assert(Docs.detectFormat(rtfPdf) === "rtf")
    assert(Docs.extractAny(rtfPdf).exists(_._1 == "rtf"))
  }

  private def zipOf(entries: (String, String)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (n, c) =>
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(utf8(c)); z.closeEntry()
    }
    z.close(); bos.toByteArray
  }

  test("zip container precedence: conflicting member markers resolve documented order") {
    // docx names + an OCF container.xml → epub wins (container.xml is
    // the OCF discriminator and outranks word/document.xml)
    val both = zipOf("word/document.xml" -> "<w:document/>",
      "META-INF/container.xml" -> "<container/>")
    assert(Docs.detectFormat(both) === "epub")
    Docs.extractAny(both) // alien chapters degrade, never throw
    // an epub MIMETYPE stapled onto a docx layout → epub by mime precedence
    val mimeLie = zipOf("mimetype" -> "application/epub+zip",
      "word/document.xml" -> "<w:document/>")
    assert(Docs.detectFormat(mimeLie) === "epub")
    Docs.extractAny(mimeLie)
    // an honest docx still routes and extracts
    val docx = Docs.syntheticDocx(Seq(Seq("w")), storedParts = false)
    assert(Docs.detectFormat(docx) === "docx")
    assert(Docs.extractAny(docx).exists { case (f, t) => f == "docx" && t.contains("w") })
    // a bare zip with neither marker routes nowhere
    assert(Docs.detectFormat(zipOf("a.txt" -> "x")) === "zip")
    assert(Docs.extractAny(zipOf("a.txt" -> "x")) === None)
  }

  test("prefix text markers: mbox/warc/latex prefixes with alien bodies") {
    val mboxHtml = utf8("From a@x Thu Jan  1 00:00:00 2026\n<html><body>hi</body></html>")
    assert(Docs.detectFormat(mboxHtml) === "mbox")
    assert(Docs.extractAny(mboxHtml).forall(_._1 == "mbox"))
    val warcGarbage = utf8("WARC/1.0\r\n\u0000\u0001\u0002 not headers at all")
    assert(Docs.detectFormat(warcGarbage) === "warc")
    val w = Docs.extractAny(warcGarbage)
    assert(w.forall { case (f, t) => f == "warc" && t.isEmpty }, "garbage warc degrades empty")
    val latexBin = utf8("\\documentclass{article}") ++ Array.tabulate[Byte](64)(i => i.toByte)
    assert(Docs.detectFormat(latexBin) === "latex")
    assert(Docs.extractAny(latexBin).forall(_._1 == "latex"))
    // leading whitespace does not defeat the html sniff
    assert(Docs.detectFormat(utf8("\n\t <!DOCTYPE HTML><p>x</p>")) === "html")
  }

  test("gzip wrapper routes by INNER magic, not the wrapper") {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(utf8("%PDF-1.4\nnothing else")); gz.close()
    assert(Docs.detectFormat(bos.toByteArray) === "pdf")
    assert(Docs.extractAny(bos.toByteArray).forall(_._1 == "pdf"))
    // truncated gzip of a pdf: unknown, not a throw
    val cut = java.util.Arrays.copyOf(bos.toByteArray, bos.size() / 2)
    assert(Docs.detectFormat(cut) === "unknown")
    assert(Docs.extractAny(cut) === None)
  }

  test("wrong-codec shards: extension lies, magic decides; corrupt bodies drop") {
    val payload = utf8("{\"a\":1}\n{\"a\":2}\n")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos); gz.write(payload); gz.close()
    // a gzip body (whatever its filename claimed) decodes by magic
    assert(Archives.decompressAny(bos.toByteArray).map(_.toSeq) === Some(payload.toSeq))
    // zstd magic stapled onto a gzip body: the zstd path must reject,
    // not decode garbage — corrupt-input posture
    val lie = Array[Byte](0x28, 0xB5.toByte, 0x2F, 0xFD.toByte) ++ bos.toByteArray
    assert(Archives.decompressAny(lie) === None)
    // xz magic over random bytes, bz2 magic over zeros
    assert(Archives.decompressAny(
      Array[Byte](0xFD.toByte, '7', 'z', 'X', 'Z', 0, 13, 9, 77)) === None)
    assert(Archives.decompressAny(Array[Byte]('B', 'Z', 'h', 0, 0, 0, 0)) === None)
  }

  test("truncated front matter never swallows the document") {
    // opening fence with no close: NOT front matter — the body is prose
    assert(Markdown.frontMatter("---\ntitle: x\nbody continues forever") === None)
    assert(Markdown.frontMatter("---\n") === None)
    assert(Markdown.frontMatter("---") === None)
    // a well-formed block still parses right next to the truncated ones
    val ok = Markdown.frontMatter("---\ntitle: x\n---\nbody")
    assert(ok.exists(_.exists { case (k, v) => k == "title" && v == "x" }))
  }

  test("router flatMap over a hostile mixed batch: total, deterministic") {
    val cases: Seq[Array[Byte]] = Seq(
      utf8("%PDF-1.4\n{\\rtf1}"),
      utf8("{\\rtf1 {nested"),
      utf8("From \u0000\u0001"),
      utf8("WARC/1.0\r\n\r\n"),
      utf8("\\begin{document}\u0000"),
      utf8("<html><Body attr='"),
      Array[Byte]('P', 'K', 3, 4, 99, 99, 99, 99),
      Array.emptyByteArray,
      null)
    // twice, to pin determinism as well as totality
    val r1 = cases.map(b => try Docs.extractAny(b).map(_._1) catch {
      case e: Throwable => fail(s"router threw: $e") })
    val r2 = cases.map(Docs.extractAny(_).map(_._1))
    assert(r1 === r2)
  }
}
