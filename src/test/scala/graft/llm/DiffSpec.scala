package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Unified-diff walk + patch application (round 13). */
class DiffSpec extends AnyFunSuite {

  private def d(files: Seq[(String, Seq[(Int, Seq[String], Seq[String], Seq[String], Seq[String])])]) =
    new String(Diff.syntheticDiff(files), "UTF-8")

  test("parse: headers, hunk arithmetic, multi-file, b/ prefix strip") {
    val text = d(Seq(
      ("src/a.txt", Seq(
        (2, Seq("ctx1"), Seq("old1", "old2"), Seq("new1"), Seq("ctx2")),
        (9, Seq.empty, Seq("gone"), Seq("here", "too"), Seq("tail")))),
      ("b.txt", Seq((1, Seq.empty, Seq.empty, Seq("fresh"), Seq.empty)))))
    val parsed = Diff.parseDiff(text)
    assert(parsed.map(_._1) == Seq("src/a.txt", "b.txt"))
    val h = parsed.head._2
    assert(h.map(x => (x.oldStart, x.oldLen, x.newStart, x.newLen)) ==
      Seq((2, 4, 2, 3), (9, 2, 8, 3)))  // second newStart shifted by -1
    assert(h(0).lines == Seq(" ctx1", "-old1", "-old2", "+new1", " ctx2"))
    assert(parsed(1)._2.head.lines == Seq("+fresh"))
  }

  test("count-based framing: added content starting with +++/--- survives") {
    val tricky = "--- a/x\n+++ b/x\n@@ -1,1 +1,3 @@\n ctx\n+++not a header\n+--- nor this\n"
    val parsed = Diff.parseDiff(tricky)
    assert(parsed.head._2.head.lines == Seq(" ctx", "+++not a header", "+--- nor this"))
  }

  test("apply: substitution, insertion, verification failures") {
    val orig = (1 to 8).map(i => s"l$i").mkString("\n")
    val hunks = Seq(Diff.Hunk(3, 3, 3, 4, Seq(" l3", "-l4", "+n1", "+n2", " l5")))
    assert(Diff.applyHunks(orig, hunks).contains(
      Seq("l1", "l2", "l3", "n1", "n2", "l5", "l6", "l7", "l8").mkString("\n")))
    // context mismatch → None, not a half-applied blob
    assert(Diff.applyHunks(orig, Seq(Diff.Hunk(3, 3, 3, 4,
      Seq(" WRONG", "-l4", "+n1", "+n2", " l5")))).isEmpty)
    // removed-line mismatch → None
    assert(Diff.applyHunks(orig, Seq(Diff.Hunk(3, 3, 3, 4,
      Seq(" l3", "-NOPE", "+n1", "+n2", " l5")))).isEmpty)
    // out-of-range hunk → None
    assert(Diff.applyHunks(orig, Seq(Diff.Hunk(99, 1, 99, 1, Seq(" l1")))).isEmpty)
    // two hunks with a running delta
    val two = Seq(
      Diff.Hunk(2, 1, 2, 2, Seq(" l2", "+i1")),
      Diff.Hunk(6, 1, 7, 1, Seq("-l6", "+r6")))
    assert(Diff.applyHunks(orig, two).contains(
      Seq("l1", "l2", "i1", "l3", "l4", "l5", "r6", "l7", "l8").mkString("\n")))
  }

  test("corrupt input: garbage, truncations, malformed hunks never throw") {
    assert(Diff.parseDiff(null).isEmpty)
    assert(Diff.parseDiff("no diff here").isEmpty)
    val ok = d(Seq(("a", Seq((1, Seq("c"), Seq("o"), Seq("n"), Seq.empty)))))
    (1 until ok.length by 3).foreach(k => Diff.parseDiff(ok.take(k)))
    // declared counts larger than the body = prefix rule, no hunk emitted
    assert(Diff.parseDiff("+++ b/x\n@@ -1,5 +1,5 @@\n ctx\n").head._2.isEmpty)
    // malformed body line ends the file walk, earlier hunks kept
    val mixed = "+++ b/x\n@@ -1,1 +1,1 @@\n ctx\n@@ -notahunk\njunk"
    assert(Diff.parseDiff(mixed).head._2.length == 1)
  }
}
