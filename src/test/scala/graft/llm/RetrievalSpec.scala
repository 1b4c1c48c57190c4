package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

/** Rank fusion + diversification (round 15): hand-checked RRF
  * arithmetic (Cormack et al. 2009's 1/(c+rank) in integer micro-units)
  * and the round-robin interleave's ordering contract. */
class RetrievalSpec extends AnyFunSuite {

  private def ranking(rows: Seq[(Long, Long, Long)]) = {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    rows.toDF("q_id", "nn_id", "rank")
  }

  test("RRF fuses by hand-checked integer arithmetic") {
    // list A: docs 1,2,3 at ranks 1,2,3; list B: docs 3,1 at ranks 1,2.
    // c=60 → contributions 1e6 div 61=16393, div 62=16129, div 63=15873.
    // doc3 = 15873+16393 = 32266; doc1 = 16393+16129 = 32522; doc2 = 16129.
    val a = ranking(Seq((7L, 1L, 1L), (7L, 2L, 2L), (7L, 3L, 3L)))
    val b = ranking(Seq((7L, 3L, 1L), (7L, 1L, 2L)))
    val out = Retrieval.rrfFuse(Seq(a, b), "q_id", "nn_id", "rank", c = 60, topK = 10)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3))).toList.sortBy(_._2)
    assert(out == List((1L, 1, 32522L), (3L, 2, 32266L), (2L, 3, 16129L)))
  }

  test("RRF is symmetric in list order and ties break by id") {
    val a = ranking(Seq((1L, 10L, 1L), (1L, 20L, 2L)))
    val b = ranking(Seq((1L, 20L, 1L), (1L, 10L, 2L)))
    // both docs score 16393+16129 — tie, so rank order is id order
    val ab = Retrieval.rrfFuse(Seq(a, b), "q_id", "nn_id", "rank", topK = 5)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    val ba = Retrieval.rrfFuse(Seq(b, a), "q_id", "nn_id", "rank", topK = 5)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(ab == ba && ab == Set((10L, 1), (20L, 2)))
  }

  test("RRF topK bounds the output per query, queries stay independent") {
    val a = ranking((1L to 6L).map(i => (1L, i, i)) ++ Seq((2L, 99L, 1L)))
    val out = Retrieval.rrfFuse(Seq(a), "q_id", "nn_id", "rank", topK = 3)
    val byQ = out.collect().groupBy(_.getLong(0))
    assert(byQ(1L).length == 3 && byQ(2L).length == 1)
    // per-query ranks are 1-based and contiguous
    assert(byQ(1L).map(_.getInt(2)).sorted.toList == List(1, 2, 3))
  }

  test("interleave emits every group's best before any group's second") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    // one query, groups x (ids 1,2,3 at ranks 1,2,3) and y (ids 4,5 at 4,5)
    val ranked = Seq(
      (1L, 1L, 1L, "x"), (1L, 2L, 2L, "x"), (1L, 3L, 3L, "x"),
      (1L, 4L, 4L, "y"), (1L, 5L, 5L, "y"))
      .toDF("q_id", "nn_id", "rank", "label")
    val out = Retrieval.interleaveByGroup(ranked, "q_id", "nn_id", "rank", "label", topK = 5)
      .orderBy("rank").collect().map(_.getLong(1)).toList
    // round 1: x's best (orig rank 1) then y's best (orig rank 4);
    // round 2: 2 then 5; round 3: x alone
    assert(out == List(1L, 4L, 2L, 5L, 3L))
  }

  test("interleave with one group preserves the original order; topK caps") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val ranked = Seq((1L, 9L, 1L, "z"), (1L, 8L, 2L, "z"), (1L, 7L, 3L, "z"))
      .toDF("q_id", "nn_id", "rank", "label")
    val out = Retrieval.interleaveByGroup(ranked, "q_id", "nn_id", "rank", "label", topK = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toList
    assert(out == List(9L, 8L))
  }

  private def cands(rows: Seq[(Long, Long, Long, Array[Float])]) = {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    rows.toDF("q_id", "nn_id", "rel", "emb")
  }

  test("MMR demotes the near-duplicate of the first pick") {
    // doc 1: most relevant. doc 2: second-most relevant but IDENTICAL
    // direction to 1 (simµ = 1e6). doc 3: less relevant, orthogonal.
    // Pure relevance would rank 1,2,3; MMR at λ=0.7 must pick 3 second:
    // score(2) = .7·900000 − .3·1000000 = 330000·µ < score(3) = .7·500000
    val out = Retrieval.mmrSelect(cands(Seq(
        (1L, 1L, 950000L, Array(1f, 0f)),
        (1L, 2L, 900000L, Array(2f, 0f)),
        (1L, 3L, 500000L, Array(0f, 1f)))),
      "q_id", "nn_id", "rel", "emb", k = 3)
      .orderBy("rank").collect().map(_.getLong(1)).toList
    assert(out == List(1L, 3L, 2L))
  }

  test("MMR keeps the signed max: anti-correlated candidates earn a bonus") {
    // doc 2 and doc 3 have equal relevance; 2 is orthogonal to the first
    // pick (simµ = 0), 3 is OPPOSITE (simµ = −1e6). The signed max gives
    // 3 a redundancy bonus: score(3) = .7·r + .3·1e6 > score(2) = .7·r.
    // A 0-clamped max would tie them and pick 2 by id — the exact bug
    // the DuckDB replay caught.
    val out = Retrieval.mmrSelect(cands(Seq(
        (1L, 1L, 900000L, Array(1f, 0f)),
        (1L, 2L, 400000L, Array(0f, 1f)),
        (1L, 3L, 400000L, Array(-1f, 0f)))),
      "q_id", "nn_id", "rel", "emb", k = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toList
    assert(out == List(1L, 3L))
  }

  test("MMR caps candidates by relevance, k by list size; queries independent") {
    val rows = (1L to 5L).map(i => (1L, i, 1000000L - i * 1000L,
      Array(i.toFloat, 1f))) :+ (2L, 77L, 5000L, Array(1f, 1f))
    val out = Retrieval.mmrSelect(cands(rows), "q_id", "nn_id", "rel", "emb",
      k = 10, maxCandidates = 3)
    val byQ = out.collect().groupBy(_.getLong(0))
    // q1: only the 3 most relevant survive the cap; q2's singleton stands
    assert(byQ(1L).map(_.getLong(1)).toSet == Set(1L, 2L, 3L))
    assert(byQ(2L).map(r => (r.getLong(1), r.getInt(2))).toList == List((77L, 1)))
  }

  test("evalRanking: hand-checked recall, MRR, and nDCG micro-units") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    // q1 top-3 = [a=10 (r1), b=20 (r2), c=30 (r3)]; relevant = {a, c, d=40}
    val ranked = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("q_id", "nn_id", "rank")
    val qrels = Seq((1L, 10L), (1L, 30L), (1L, 40L)).toDF("q_id", "nn_id")
    val r = Retrieval.evalRanking(ranked, qrels, "q_id", "nn_id", "rank", k = 3)
      .collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)       // n_rel, hits
    assert(r.getLong(3) == 666666L)                        // 1e6·2 div 3
    assert(r.getLong(4) == 1000000L)                       // first hit at rank 1
    // dcg = 1e6/log2(2) + 1e6/log2(4) = 1000000 + 500000
    assert(r.getLong(5) == 1500000L)
    // idcg over ranks 1..3 = 1000000 + 630930 + 500000 (floored terms)
    val idcg = 1000000L + 630930L + 500000L
    assert(r.getLong(6) == 1000000L * 1500000L / idcg)
  }

  test("evalRanking: zero-hit queries score zero; unjudged queries drop") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val ranked = Seq((1L, 10L, 1L), (9L, 99L, 1L)).toDF("q_id", "nn_id", "rank")
    val qrels = Seq((1L, 50L), (2L, 60L)).toDF("q_id", "nn_id")
    val out = Retrieval.evalRanking(ranked, qrels, "q_id", "nn_id", "rank", k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(6))).toMap
    // q1 judged but missed everything; q2 judged, never ranked; q9 unjudged
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((0L, 0L, 0L, 0L)) && out(2L) == ((0L, 0L, 0L, 0L)))
  }

  test("rrfFuse plan has no Window operator (bounded aggregation ranks)") {
    val a = ranking(Seq((1L, 1L, 1L)))
    val plan = Retrieval.rrfFuse(Seq(a, a), "q_id", "nn_id", "rank", topK = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
  }
}
