package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** WordPiece greedy segmentation (round 14): hand cases for the
  * longest-match rule, the ## continuation convention, the whole-word
  * [UNK] fallback, and the long-token guard. */
class WordpieceSpec extends AnyFunSuite {

  private val vocab = Set("un", "unab", "able", "##le", "##able", "##a",
    "##b", "a", "b", "x", "##x")

  test("greedy takes the LONGEST match at each position") {
    // at pos 0 both "un" and "unab" match — greedy must take "unab",
    // then "##le" covers the tail
    assert(Wordpiece.segment("unable", vocab) === Some(Seq("unab", "##le")))
    // a whole-word vocab hit is one piece
    assert(Wordpiece.segment("able", vocab) === Some(Seq("able")))
    // continuations use the ## form, never the plain one
    assert(Wordpiece.segment("xab", vocab) === Some(Seq("x", "##a", "##b")))
  }

  test("uncoverable suffix invalidates the WHOLE word (BERT [UNK] rule)") {
    assert(Wordpiece.segment("unq", vocab) === None, "q has no piece")
    assert(Wordpiece.segment("qun", vocab) === None, "bad head too")
    // partial coverage must not leak: "un" matches but the tail fails
    assert(Wordpiece.segment("un!", vocab) === None)
  }

  test("guards: empty word, long-token cap") {
    assert(Wordpiece.segment("", vocab) === Some(Nil))
    assert(Wordpiece.segment("x" * 101, vocab) === None, "BERT's 100-char cap")
    assert(Wordpiece.segment("x" * 100, vocab) ===
      Some(Seq("x") ++ Seq.fill(99)("##x")))
  }

  test("the q_wordpiece_encode construction premise holds for every combination") {
    // every 3-piece concatenation over the z-terminator set must
    // greedy-decode back to exactly its build — the claim the oracle
    // replay rests on, checked exhaustively (6^3 words)
    val pcs = Seq("az", "boz", "cedz", "difuz", "egz", "fohz")
    val v = (pcs ++ pcs.map("##" + _)).toSet
    for (a <- pcs; b <- pcs; c <- pcs) {
      assert(Wordpiece.segment(a + b + c, v) ===
        Some(Seq(a, "##" + b, "##" + c)), s"$a+$b+$c")
    }
  }
}
