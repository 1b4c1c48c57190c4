package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** BibTeX walk (round 13): value grammar, macros, posture. */
class BibtexSpec extends AnyFunSuite {

  private def one(src: String) = Bibtex.parseBib(src)

  test("value grammar: braces, quotes, bare words, concatenation, macros") {
    val e = one("""@article{k1, title = {The {Nested} One}, year = 2001}""").head
    assert(e == (("article", "k1", Map("title" -> "The Nested One", "year" -> "2001"))))
    val q = one("@misc{k2, note = \"a\nhard   wrapped\tvalue\"}").head
    assert(q._3("note") == "a hard wrapped value", "whitespace collapse")
    val m = one(
      """@string{jx = {J. Stuff}}
        |@article{k3, journal = "Proc. " # jx # " Vol" }""".stripMargin).head
    assert(m._3("journal") == "Proc. J. Stuff Vol")
    assert(one("@a{k, f = unknownmacro}").head._3("f") == "unknownmacro", "fail-open")
    // a brace-protected quote inside a quoted value
    assert(one("@a{k, t = \"x {\"} y\"}").head._3("t") == "x \" y")
  }

  test("entry types case-insensitive; comment/preamble/string invisible") {
    val es = one(
      """@COMMENT{junk {with} braces}
        |@PREAMBLE{ "\newcommand{\x}{y}" }
        |@Article{K, year = 1999}""".stripMargin)
    assert(es == Seq(("article", "K", Map("year" -> "1999"))))
  }

  test("prefix posture: completed entries survive a broken tail") {
    val es = one("@book{ok, year = 1}\n@article{bad, title = {never closed")
    assert(es == Seq(("book", "ok", Map("year" -> "1"))))
    assert(one(null) == Nil)
    assert(one("no entries here") == Nil)
    val rng = new scala.util.Random(5)
    for (_ <- 0 until 200) {
      val s = (0 until 60).map(_ => "@{}=,#\"ab 1\n".charAt(rng.nextInt(12))).mkString
      Bibtex.parseBib(s) // must not throw
    }
  }
}
