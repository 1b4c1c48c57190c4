package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Unigram-LM tokenizer mechanics (round 13). The oracled query
  * (q_unigram_encode) pins end behavior on an analytically-forced
  * corpus; this spec pins the EM/Viterbi mechanics themselves. */
class UnigramSpec extends AnyFunSuite with SparkSpec {

  test("EM concentrates on the planted piece; Viterbi segments with it") {
    import spark.implicits._
    val df = (0 until 60).map(i => (i.toLong, "ab" * (1 + i % 5))).toDF("doc_id", "text")
    val m = Unigram.train(df, "text", vocabSize = 8, maxPieceLen = 2, iters = 4)
    val multis = m.logp.filter(_._1.length > 1)
    assert(multis.nonEmpty && multis.maxBy(_._2)._1 == "ab",
      s"expected ab to dominate: ${m.logp}")
    assert(m.logp("ab") > m.logp.getOrElse("ba", Double.NegativeInfinity))
    val enc = Unigram.encode(df, "doc_id", "text", m, maxPieceLen = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    (0 until 60).foreach { i =>
      val k = 1 + i % 5
      assert(enc(i.toLong) == ((k.toLong, Seq.fill(k)("ab").mkString("|"))), s"doc $i")
    }
  }

  test("likelihood trace is non-decreasing (EM contract)") {
    import spark.implicits._
    val df = (0 until 40).map(i =>
      (i.toLong, Seq("the cat", "the hat", "a cat sat")(i % 3))).toDF("id", "text")
    val m = Unigram.train(df, "text", vocabSize = 32, maxPieceLen = 3, iters = 5)
    val t = m.likTrace
    assert(t.length == 5)
    t.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"likelihood decreased: $t")
    }
  }

  test("coverage: unseen characters fall back to singles, never throw") {
    import spark.implicits._
    val df = (0 until 20).map(i => (i.toLong, "ab" * 3)).toDF("id", "text")
    val m = Unigram.train(df, "text", vocabSize = 4, maxPieceLen = 2, iters = 2)
    val probe = Seq((99L, "abzq ab"), (100L, ""), (101L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = Unigram.encode(probe, "id", "text", m, maxPieceLen = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(99L) == ((4L, "ab|z|q|ab")))
    assert(got(100L) == ((0L, "")) && got(101L) == ((0L, "")))
  }

  test("viterbi tie-break: longer last piece wins, deterministic") {
    val logp = Map("a" -> -1.0, "b" -> -1.0, "c" -> -1.0, "ab" -> -1.0, "bc" -> -1.0)
    assert(Unigram.viterbi("abc", logp, 2) == Seq("a", "bc"))
    assert(Unigram.viterbi("", logp, 2).isEmpty)
    assert(Unigram.viterbi("cab", logp, 2) == Seq("c", "ab"))
  }

  test("pruning keeps single chars and respects vocabSize for multis") {
    import spark.implicits._
    val df = (0 until 30).map(i => (i.toLong, "abc abd abe")).toDF("id", "text")
    val m = Unigram.train(df, "text", vocabSize = 2, maxPieceLen = 3, iters = 3)
    assert(m.logp.count(_._1.length > 1) <= 2)
    assert(Seq("a", "b", "c", "d", "e").forall(m.logp.contains))
  }
}
