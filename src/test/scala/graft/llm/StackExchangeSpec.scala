package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Stack Exchange dump walk (round 13). */
class StackExchangeSpec extends AnyFunSuite {

  private val rows = Seq(
    (1L, 1, 42, "How do I & why?", Seq("scala", "spark"), "<p>q body &amp; html</p>"),
    (2L, 2, -3, "", Seq.empty[String], "<p>answer <b>bold</b></p>"),
    (7L, 1, 0, "Second \"question\"", Seq("x"), "plain text body"))

  test("posts walk: attributes, entity decode, tag list, answer convention") {
    val ps = StackExchange.parsePosts(StackExchange.syntheticPosts(rows, 0))
    assert(ps.map(_.post_id) == Seq(1L, 2L, 7L))
    assert(ps.map(_.post_type) == Seq(1, 2, 1))
    assert(ps.map(_.score) == Seq(42, -3, 0))
    assert(ps(0).title == "How do I & why?")
    assert(ps(0).tags == "scala,spark")
    assert(ps(0).body_text == "q body & html")
    assert(ps(1).title == "" && ps(1).tags == "")
    assert(ps(1).body_text == "answer bold")
    assert(ps(2).title == "Second \"question\"" && ps(2).tags == "x")
  }

  test("codecs land on the plain walk") {
    val plain = StackExchange.parsePosts(StackExchange.syntheticPosts(rows, 0))
    Seq(1, 2, 4).foreach { c =>
      assert(StackExchange.parsePosts(StackExchange.syntheticPosts(rows, c)) == plain,
        s"codec $c")
    }
  }

  test("cross-validated against javax.xml DOM") {
    val bytes = StackExchange.syntheticPosts(rows, 0)
    val db = javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
    val doc = db.parse(new java.io.ByteArrayInputStream(bytes))
    val nodes = doc.getElementsByTagName("row")
    val ours = StackExchange.parsePosts(bytes)
    assert(nodes.getLength == ours.length)
    (0 until nodes.getLength).foreach { i =>
      val e = nodes.item(i).asInstanceOf[org.w3c.dom.Element]
      assert(e.getAttribute("Id").toLong == ours(i).post_id)
      assert(e.getAttribute("Score").toInt == ours(i).score)
      assert(e.getAttribute("Title") == ours(i).title)
      assert(Warc.htmlText(e.getAttribute("Body")) == ours(i).body_text)
    }
  }

  test("tags: bracket list, plain passthrough, empties") {
    assert(StackExchange.parseTags("<a><b-c><d.e>") == "a,b-c,d.e")
    assert(StackExchange.parseTags("already,plain") == "already,plain")
    assert(StackExchange.parseTags("") == "" && StackExchange.parseTags(null) == "")
    assert(StackExchange.parseTags("<lone>") == "lone")
  }

  test("corrupt posture: garbage, id-less rows skipped, truncation") {
    assert(StackExchange.parsePosts(null).isEmpty)
    assert(StackExchange.parsePosts("not xml".getBytes).isEmpty)
    val mixed = ("""<posts><row Score="1" /><row Id="9" Score="2" /></posts>""").getBytes
    val ps = StackExchange.parsePosts(mixed)
    assert(ps.map(_.post_id) == Seq(9L) && ps.head.row_idx == 0)
    val gz = StackExchange.syntheticPosts(rows, 1)
    (1 until gz.length by 5).foreach(k => StackExchange.parsePosts(gz.take(k)))
  }
}
