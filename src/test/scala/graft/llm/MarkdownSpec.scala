package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Markdown extraction (round 13): rule-by-rule semantics + the
  * fixture sweep + posture. */
class MarkdownSpec extends AnyFunSuite {

  private def t(s: String): String = Markdown.mdText(s)

  test("structural rules: fences, headings, quotes, lists, setext, refs") {
    assert(t("# H1\ntext") == "H1 text")
    assert(t("### deep\nx") == "deep x")
    assert(t("a\n```\ncode gone\n```\nb") == "a b")
    assert(t("a\n~~~\nalso gone\n~~~\nb") == "a b")
    assert(t("> quoted\n> > nested") == "quoted nested")
    assert(t("- one\n+ two\n* three\n3. four\n12) five") == "one two three four five")
    assert(t("Heading\n---\nafter") == "Heading after") // underline gone, heading kept
    assert(t("===\nx") == "x")
    assert(t("[ref]: http://x\nkept") == "kept")
  }

  test("inline rules: links, images, code spans, emphasis, tables") {
    assert(t("see [docs](http://a/b) here") == "see docs here")
    assert(t("![an image](u.png) after") == "an image after")
    assert(t("via [text][ref] form") == "via text form")
    assert(t("run `cmd --flag` now") == "run cmd --flag now")
    assert(t("**bold** and *it* stay text") == "bold and it stay text")
    assert(t("snake_case survives_") == "snake_case survives_")
    assert(t("| a | b |\n| c | d |") == "a b c d")
    assert(t("inline <b>html</b> &amp; entity") == "inline html & entity")
  }

  test("fixture sweep matches the oracle's closed form") {
    for (id <- 0L until 120L) {
      val exp = s"Title $id Intro bold and link ${id % 29} plus x = ${id % 13} end. " +
        s"item one ${id % 23} item two quote ${id % 31} & tail alt ${id % 19} Setext H"
      assert(t(graft.queries.LlmQueries.mdSrc(id)) == exp, s"md text at id=$id")
    }
  }

  test("never a throw: null, unterminated fence, hostile input") {
    assert(t(null) == "")
    assert(t("") == "")
    assert(t("```\nnever closed") == "")
    val rng = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val s = (0 until 60).map(_ => "#>*-`[]()!|\nab ".charAt(rng.nextInt(15))).mkString
      Markdown.mdText(s) // must not throw
    }
  }

  test("front matter: quoted values, file order, unclosed fence, absent") {
    val fm = Markdown.frontMatter(
      "---\ntitle: \"A: B\"\ndate: 2026-01-02\nempty:\ntags: 'x y'\n---\nbody")
    assert(fm.contains(Seq(
      ("title", "A: B"), ("date", "2026-01-02"), ("empty", ""), ("tags", "x y"))))
    assert(Markdown.frontMatter("# no fence").isEmpty)
    assert(Markdown.frontMatter("---\nkey: v\nno close ever").isEmpty)
    assert(Markdown.frontMatter("---\n...\nbody").contains(Seq.empty))
    assert(Markdown.frontMatter(null).isEmpty)
    // a non-key line inside the block is skipped, not fatal
    assert(Markdown.frontMatter("---\njust words\nk: v\n---\n")
      .contains(Seq(("k", "v"))))
  }
}
