package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** LaTeX extraction (round 13): rule-by-rule semantics, the fixture
  * sweep, and the never-throw posture. */
class LatexSpec extends AnyFunSuite {

  private def t(s: String): String = Latex.latexText(s)

  test("comments: unescaped % to EOL; \\% is the literal percent") {
    assert(t("a % gone\nb") == "a b")
    assert(t("100\\% kept % gone") == "100% kept")
    assert(t("% whole line\nx") == "x")
  }

  test("math: $, $$, \\(\\), \\[\\] removed whole; unterminated swallows") {
    assert(t("a $x^2_{i}$ b") == "a b")
    assert(t("a $$E=mc^2$$ b") == "a b")
    assert(t("a \\(x\\) b \\[y\\] c") == "a b c")
    assert(t("a $never closed") == "a")
    assert(t("price is \\$5") == "price is $5") // escaped dollar is prose
  }

  test("environments: drop set removes body (nested same-name), others keep prose") {
    assert(t("a \\begin{equation} x=1 \\end{equation} b") == "a b")
    assert(t("a \\begin{figure} \\begin{figure} in \\end{figure} deep \\end{figure} b")
      == "a b")
    assert(t("\\begin{itemize} \\item one \\item two \\end{itemize}") == "one two")
    assert(t("\\begin{abstract} kept \\end{abstract}") == "kept")
    assert(t("a \\begin{equation} never closed") == "a")
    assert(t("a \\begin{align*} x \\end{align*} b") == "a b") // starred form
  }

  test("commands: prose arguments kept, reference/preamble arguments dropped") {
    assert(t("\\section{Intro} body") == "Intro body")
    assert(t("\\emph{word} and \\textbf{bold}") == "word and bold")
    assert(t("see \\cite{key2024} here") == "see here")
    assert(t("see \\cite[p.~3]{key} here") == "see here")
    assert(t("\\includegraphics[width=3cm]{fig.png} cap") == "cap")
    assert(t("\\documentclass[11pt]{article}\\usepackage{x} y") == "y")
    assert(t("\\newcommand{\\foo}{bar} z") == "z")
    assert(t("\\unknowncmd{prose flows} on") == "prose flows on")
    assert(t("a\\\\b") == "a b")
  }

  test("character escapes and grouping") {
    assert(t("x\\_y \\& a\\#b \\{c\\}") == "x_y & a#b {c}")
    assert(t("a~b") == "a b")
    assert(t("{grouped} {text}") == "grouped text")
  }

  test("fixture sweep matches the oracle's closed form") {
    for (id <- 0L until 120L) {
      val exp = s"T $id S ${id % 50} Body em ${id * 3 % 97} with math dropped. " +
        s"Cite and pct 100% amp & und x_y. First ${id % 41} " +
        s"Second bold ${id * 11 % 73} Line one line two tail ${id * 13 % 61}."
      assert(t(graft.queries.LlmQueries.latexSrc(id)) == exp, s"latex text at id=$id")
    }
  }

  test("never a throw: null, empty, hostile inputs") {
    assert(t(null) == "")
    assert(t("") == "")
    assert(t("\\") == "")
    assert(t("\\begin{") == "")
    assert(t("{{{{") == "")
    assert(t("$" * 101) == "")
    val rng = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val s = (0 until 80).map(_ => "\\{}$%~[]()a b\nc".charAt(rng.nextInt(15))).mkString
      Latex.latexText(s) // must not throw
    }
  }
}
