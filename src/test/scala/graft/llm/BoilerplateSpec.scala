package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Block segmentation + boilerplate classification (round 13). */
class BoilerplateSpec extends AnyFunSuite {

  private val longText =
    "This paragraph is comfortably longer than the twenty-five character gate."

  test("segmentation: block tags cut, inline tags do not") {
    val bs = Boilerplate.blocks(s"<p>$longText</p><p>second part also long enough to pass the gate</p>")
    assert(bs.map(_.text) == Seq(longText,
      "second part also long enough to pass the gate"))
    assert(bs.map(_.block_idx) == Seq(0, 1))
    // inline <b>/<span> stay inside the block (tag chars vanish)
    val one = Boilerplate.blocks(s"<p>one <b>bold</b> and <span>span</span> tail of sufficient length here</p>")
    assert(one.map(_.text) == Seq("one bold and span tail of sufficient length here"))
  }

  test("length gate, link density, and chrome context") {
    val bs = Boilerplate.blocks(
      "<nav><a href='/'>Home</a></nav>" +
        s"<p>$longText</p>" +
        "<p>short</p>" +
        s"<div><a href='/'>all of this block text is anchor text over the bar</a></div>" +
        s"<footer>$longText</footer>")
    assert(bs.map(b => (b.text.take(4), b.ctx_dropped, b.is_content)) == Seq(
      ("Home", true, false),
      ("This", false, true),
      ("shor", false, false),
      ("all ", false, false),
      ("This", true, false)))
    // the link-density block: every char is link char
    assert(bs(3).n_chars == bs(3).link_chars)
  }

  test("density bar is the documented integer rule at the boundary") {
    // 40 content chars, 16 link chars → 16*100 = 1600 <= 40*40 = 1600: content
    val pad = "x" * 24 // 24 + 16 = 40 total
    val at = Boilerplate.blocks(s"<p>$pad<a>0123456789abcdef</a></p>")
    assert(at.head.n_chars == 40 && at.head.link_chars == 16 && at.head.is_content)
    // one more link char tips it
    val over = Boilerplate.blocks(s"<p>${"x" * 23}<a>0123456789abcdefg</a></p>")
    assert(over.head.n_chars == 40 && over.head.link_chars == 17 && !over.head.is_content)
  }

  test("script/style/comments never measured; entities count decoded") {
    val bs = Boilerplate.blocks(
      s"<p>$longText<script>var lots = 'of text in here';</script></p>" +
        "<p>ampersand &amp; entity block long enough to pass the gate</p>")
    assert(bs.map(_.text) == Seq(longText,
      "ampersand & entity block long enough to pass the gate"))
    assert(bs(1).n_chars == "ampersand & entity block long enough to pass the gate".length)
    assert(Boilerplate.blocks(s"<p><!-- $longText --></p>").isEmpty)
  }

  test("mainText keeps exactly the content blocks") {
    val html = s"<nav><a>H</a></nav><p>$longText</p><p>short</p><p>$longText</p>"
    assert(Boilerplate.mainText(html) == s"$longText $longText")
    assert(Boilerplate.mainText("<nav>only chrome</nav>") == "")
  }

  test("degrades, never throws: unbalanced, hostile, null") {
    assert(Boilerplate.blocks(null).isEmpty)
    assert(Boilerplate.blocks("").isEmpty)
    // unclosed nav drops the rest of the page
    assert(Boilerplate.blocks(s"<nav><p>$longText</p>").forall(!_.is_content))
    // stray closes floor at zero, text still classified
    val bs = Boilerplate.blocks(s"</nav></a><p>$longText</p>")
    assert(bs.exists(_.is_content))
    // plain text with no tags at all is one block
    assert(Boilerplate.blocks(longText).map(_.text) == Seq(longText))
  }
}
