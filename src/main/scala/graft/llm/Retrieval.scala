package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion and result diversification over retrieval lists — the
  * layer that sits ABOVE the ranking families (BM25 in
  * [[graft.llm.TextAnalysis]], the ANN family in [[graft.llm.Ann]] /
  * [[graft.llm.Ivf]] / [[graft.llm.Pq]]) and combines their outputs
  * into one hybrid ranking. A curation pipeline retrieves the same
  * query against the lexical index and the embedding index and needs a
  * principled merge; RRF (Cormack, Clarke & Buettcher, SIGIR 2009) is
  * the standard score-free merge because it needs only RANKS, so
  * incomparable score scales (BM25 micro-nats vs cosine) never touch.
  *
  * Scale shape: inputs are already top-k lists, so every row here is a
  * slim (q_id, nn_id, rank) triple — |queries| × k rows, NOT corpus-
  * sized. The fusion aggregation keys on (q_id, nn_id) with map-side
  * combine; ranking reuses [[Ann.topKPerQuery]]'s bounded aggregator
  * (no per-q_id window). The diversification windows DO partition by
  * q_id, which is safe for the same reason: the partition is a k-row
  * top-k list by construction, never a corpus partition.
  *
  * Scoring is integer micro-units (`1e6 div (c + rank)`) so the
  * per-(q, d) sum is order-free and replays exactly in DuckDB —
  * the same discipline as bm25TopK's micro-nat quantization.
  */
object Retrieval {

  /** Reciprocal-rank fusion of N rankings. Each input carries
    * (`qIdCol`, `idCol`, `rankCol`) with rank 1-based; a document's
    * fused score is Σ over the lists that returned it of
    * `1_000_000 div (c + rank)` (c = 60 per the RRF paper; integer
    * division keeps the sum exact). Documents missing from a list
    * simply contribute nothing — no outer-join imputation.
    * Output: (q_id, nn_id, rank, score_micro), rank ≤ `topK` by
    * (score desc, nn_id asc). */
  def rrfFuse(rankings: Seq[DataFrame], qIdCol: String, idCol: String,
      rankCol: String, c: Int = 60, topK: Int = 10): DataFrame =
    // score_micro ≤ |lists| · 1e6 / (c+1) — far under 2^53, so the double
    // round-trip through the shared top-k aggregator is exact
    Ann.topKPerQuery(
        rrfScores(rankings, qIdCol, idCol, rankCol, c)
          .select(col("q_id"), col("nn_id"),
            col("score_micro").cast("double").as("cosine")),
        topK)
      .select(col("q_id"), col("nn_id"), col("rank"),
        col("cosine").cast("long").as("score_micro"))

  /** The fusion STATE alone: (q_id, nn_id, score_micro) with no ranking —
    * ONE keyed aggregation, which is what makes it the streaming twin's
    * seam: retrieval lists arrive as an unbounded feed and the scores
    * accumulate under Update/Complete mode (chaining the rank aggregation
    * into the same streaming query would be two stateful operators —
    * Spark's correctness checker rejects that, rightly; a consumer ranks
    * the current state per page, exactly [[rrfFuse]]'s batch layering). */
  def rrfScores(rankings: Seq[DataFrame], qIdCol: String, idCol: String,
      rankCol: String, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfScores: at least one ranking")
    require(c >= 0, "rrfScores: c must be non-negative")
    val slim = rankings.map(_.select(
      col(qIdCol).cast("long").as("q_id"),
      col(idCol).cast("long").as("nn_id"),
      expr(s"CAST(1000000 AS BIGINT) div (CAST($c AS BIGINT) + CAST($rankCol AS BIGINT))")
        .as("__rrf")))
    slim.reduce(_ unionByName _)
      .groupBy("q_id", "nn_id").agg(sum("__rrf").as("score_micro"))
  }

  /** Retrieval evaluation: recall@k, reciprocal rank, and nDCG@k per
    * query, in integer micro-units — the harness that closes the loop on
    * the ranking families (how good is the LSH/IVF/NSW list against a
    * ground-truth relevance set, in numbers an oracle can replay).
    *
    * `ranked` carries (qIdCol, idCol, rankCol); `qrels` carries
    * (qIdCol, idCol) — binary relevance, duplicates ignored. One row per
    * query PRESENT IN QRELS (a query with no relevance judgments has no
    * defined recall); rankings for unjudged queries drop out.
    *
    *  - recall_micro = 1e6·|hits∩top-k| div |relevant|
    *  - rr_micro     = 1e6 div (first relevant rank), 0 if none hit
    *  - dcg_micro    = Σ_hits floor(1e6 / log2(rank+1) + 0.5) — each term
    *    floored so the sum is order-free; log2 = ln/ln(2) with the same
    *    operand shape on both engines (the bm25 idf precedent)
    *  - ndcg_micro   = 1e6·dcg div idcg, idcg = the same series summed
    *    over ranks 1..min(k, |relevant|) (binary gains)
    *
    * Scale shape: the hit join keys on (q_id, nn_id) slim pairs; every
    * aggregation is per-query over k-bounded lists; idcg is a ≤k-element
    * fold. Nothing corpus-sized. */
  def evalRanking(ranked: DataFrame, qrels: DataFrame, qIdCol: String,
      idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, "evalRanking: k must be positive")
    val r = ranked.select(
      col(qIdCol).cast("long").as("q_id"),
      col(idCol).cast("long").as("nn_id"),
      col(rankCol).cast("long").as("__rank"))
      .filter(col("__rank") <= k)
    val rel = qrels.select(
      col(qIdCol).cast("long").as("q_id"),
      col(idCol).cast("long").as("nn_id")).distinct()
    val nrel = rel.groupBy("q_id").agg(count(lit(1)).as("n_rel"))
    val dcgTerm = expr(
      "CAST(floor(1000000.0 / (ln(CAST(__rank AS DOUBLE) + 1.0) / ln(2.0)) + 0.5) AS BIGINT)")
    val hits = r.join(rel, Seq("q_id", "nn_id"))
      .groupBy("q_id").agg(
        count(lit(1)).as("hits"),
        min("__rank").as("__minr"),
        sum(dcgTerm).as("dcg_micro"))
    nrel.join(hits, Seq("q_id"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("dcg_micro", coalesce(col("dcg_micro"), lit(0L)))
      .withColumn("recall_micro",
        expr("CAST(1000000 AS BIGINT) * hits div n_rel"))
      .withColumn("rr_micro", when(col("__minr").isNull, lit(0L))
        .otherwise(expr("CAST(1000000 AS BIGINT) div __minr")))
      .withColumn("idcg_micro", expr(
        s"""aggregate(sequence(1, int(least(CAST($k AS BIGINT), n_rel))), CAST(0 AS BIGINT),
           |  (acc, i) -> acc + CAST(floor(1000000.0 / (ln(CAST(i AS DOUBLE) + 1.0) / ln(2.0)) + 0.5) AS BIGINT))""".stripMargin))
      .withColumn("ndcg_micro",
        expr("CAST(1000000 AS BIGINT) * dcg_micro div idcg_micro"))
      .select("q_id", "n_rel", "hits", "recall_micro", "rr_micro",
        "dcg_micro", "ndcg_micro")
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998):
    * greedily pick the candidate maximizing
    * `λ·rel − (1−λ)·max_{s∈selected} sim(c, s)` — relevance traded
    * against redundancy with what's already picked, the embedding-space
    * sibling of [[interleaveByGroup]]'s categorical round-robin.
    *
    * Arithmetic is integer micro-units end-to-end so every greedy step
    * replays exactly in DuckDB (a recursive CTE walks the same
    * selection): `score = λµ·rel − (1e6−λµ)·maxSimµ`, where relevance
    * arrives pre-quantized in `relMicroCol` and the candidate-candidate
    * similarity quantizes the bit-exact [[Nsw.pairCosine]] double via
    * `floor(cos·1e6 + 0.5)`. Ties break by ascending id at every step.
    *
    * The greedy loop is inherently sequential PER QUERY but each query's
    * candidate list is small (top-k lists; `maxCandidates` caps defensively
    * by (rel desc, id) before the quadratic term) — one flatMapGroups over
    * q_id, state ∝ one list, never a corpus-sized stage.
    * Output: (q_id, nn_id, rank) with rank ≤ k in selection order. */
  def mmrSelect(candidates: DataFrame, qIdCol: String, idCol: String,
      relMicroCol: String, embCol: String, k: Int, lambdaMicro: Long = 700000L,
      maxCandidates: Int = 256): DataFrame = {
    require(k >= 1, "mmrSelect: k must be positive")
    require(lambdaMicro >= 0L && lambdaMicro <= 1000000L,
      "mmrSelect: lambdaMicro in [0, 1e6]")
    val spark = candidates.sparkSession
    import spark.implicits._
    candidates.select(col(qIdCol).cast("long"), col(idCol).cast("long"),
        col(relMicroCol).cast("long"), col(embCol).cast("array<float>"))
      .as[(Long, Long, Long, Array[Float])]
      .filter(r => r._4 != null && r._4.nonEmpty)
      .groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        val cand = it.toArray.sortBy(r => (-r._3, r._2)).take(maxCandidates)
        val n = cand.length
        val picked = new Array[Boolean](n)
        // maxSimµ(c) over the selected set, updated incrementally as each
        // winner joins — O(n) per step instead of O(n·|selected|). The max
        // over a NONEMPTY selected set keeps its sign: a candidate
        // anti-correlated with everything picked earns a redundancy BONUS
        // (the paper's max, not a 0-clamped one — clamping demoted exactly
        // the candidates MMR exists to promote, and the DuckDB replay
        // caught it); only the empty set at t=1 contributes 0
        val maxSim = Array.fill(n)(Long.MinValue)
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Int)](math.min(k, n))
        var t = 1
        while (t <= math.min(k, n)) {
          var best = -1
          var bestScore = 0L
          var i = 0
          while (i < n) {
            if (!picked(i)) {
              val red = if (t == 1) 0L else maxSim(i)
              val s = lambdaMicro * cand(i)._3 - (1000000L - lambdaMicro) * red
              if (best < 0 || s > bestScore ||
                  (s == bestScore && cand(i)._2 < cand(best)._2)) {
                best = i; bestScore = s
              }
            }
            i += 1
          }
          picked(best) = true
          out += ((q, cand(best)._2, t))
          var j = 0
          while (j < n) {
            if (!picked(j)) {
              val sim = math.floor(
                Nsw.pairCosine(cand(j)._4, cand(best)._4) * 1000000.0 + 0.5).toLong
              if (sim > maxSim(j)) maxSim(j) = sim
            }
            j += 1
          }
          t += 1
        }
        out.iterator
      }
      .toDF("q_id", "nn_id", "rank")
  }

  /** Round-robin diversification of a per-query ranking across a group
    * column (domain, source, language, cluster): emit every group's
    * best result before any group's second — the interleave that stops
    * one over-represented domain from filling the whole page. Within a
    * round, groups keep their original relative quality order (ties on
    * the original rank break by `idCol`). Output: (q_id, nn_id, grp,
    * rank) with the NEW rank ≤ `topK`.
    *
    * Both windows partition by q_id over lists that are k-bounded on
    * entry, so no partition exceeds the input's per-query k. */
  def interleaveByGroup(ranked: DataFrame, qIdCol: String, idCol: String,
      rankCol: String, groupCol: String, topK: Int = 10): DataFrame = {
    val base = ranked.select(
      col(qIdCol).cast("long").as("q_id"),
      col(idCol).cast("long").as("nn_id"),
      col(rankCol).cast("long").as("__orig"),
      col(groupCol).as("grp"))
    val withinGroup = Window.partitionBy("q_id", "grp")
      .orderBy(col("__orig"), col("nn_id"))
    val acrossRounds = Window.partitionBy("q_id")
      .orderBy(col("__round"), col("__orig"), col("nn_id"))
    base
      .withColumn("__round", row_number().over(withinGroup))
      .withColumn("rank", row_number().over(acrossRounds).cast("long"))
      .filter(col("rank") <= topK)
      .select("q_id", "nn_id", "grp", "rank")
  }
}
