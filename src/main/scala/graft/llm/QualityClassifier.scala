package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the GPT-3 / LLaMA curation move (Brown
  * et al. 2020 §A; Touvron et al. 2023): train a linear classifier to
  * separate a curated POSITIVE corpus from raw crawl NEGATIVES, score every
  * document, and keep a score-biased sample. The classifier here is
  * multinomial Naive Bayes over the same hashed unigram+bigram buckets as
  * [[Sampling.dsirWeights]] — NB's per-feature log-odds are exactly the
  * linear weights a fasttext-style model learns, with closed-form counts
  * instead of SGD, which is what makes the training REPLAYABLE bit-for-bit
  * by any engine that counts the same strings.
  *
  * Determinism contract (the [[TextAnalysis.lmScore]] posture):
  *
  *  - per-bucket weight λ_b = ⌊ln((P_b+1)(Nn+B) / ((N_b+1)(Np+B)))·10⁶ +
  *    0.5⌋ and prior = ⌊ln((|pos|+1)/(|neg|+1))·10⁶ + 0.5⌋ — integers from
  *    one double ln of exact-integer products (exact below 2⁵³);
  *  - logit(x) = prior + Σ_f λ_bucket(f) — an order-free integer sum;
  *  - score = ⌊10⁶·σ(logit/10⁶) + 0.5⌋ — ONE double exp, floored to an
  *    integer micro-probability;
  *  - the keep decision replays GPT-3's Pareto thresholding
  *    (keep iff Pareto(9) > 1 − score) with noise that is a pure function
  *    of the id: u = (⌊splitmix64(id)/2¹²⌋+½)/2⁵² (exact dyadic rational),
  *    and the power inequality cleared of `pow`:
  *    u^(−1/9) > 2−s  ⟺  t ≤ 0 ∨ u·t⁹ < 1 with t = (2·10⁶−score)/10⁶ and
  *    t⁹ as EIGHT literal left-associated multiplies — every operand and
  *    operation identical in both engines, no libm `pow` anywhere.
  *
  * Scale shape: training is two B-bounded histograms (map-side combined,
  * ≤B rows collected); scoring + filtering is a single broadcast-λ map
  * stage over the corpus scan — nothing is |corpus|-bounded anywhere.
  */
object QualityClassifier {

  /** Train on `pos`/`neg` and score `df`: (idCol, logit_micronats,
    * score_micro ∈ [0, 10⁶], keep). */
  def nbQualityFilter(df: DataFrame, idCol: String, textCol: String,
      pos: DataFrame, posTextCol: String, neg: DataFrame, negTextCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val b = buckets
    val pCnt = Sampling.featureHistogram(pos, posTextCol, b)
    val nCnt = Sampling.featureHistogram(neg, negTextCol, b)
    val pDocs = pos.count()
    val nDocs = neg.count()
    val pTot = pCnt.sum
    val nTot = nCnt.sum
    val lam = Array.tabulate(b)(i => Sampling.smoothedLogRatioMicro(pCnt(i), pTot, nCnt(i), nTot, b))
    val prior = math.floor(
      math.log((pDocs + 1).toDouble / (nDocs + 1).toDouble) * 1000000.0 + 0.5).toLong
    val bcLam = spark.sparkContext.broadcast(lam)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val l = bcLam.value
        it.map { case (id, text) =>
          var s = prior
          Sampling.dsirFeatures(text, l.length).foreach(bk => s += l(bk))
          val score = math.floor(1000000.0 / (1.0 + math.exp(-(s.toDouble / 1000000.0)))
            + 0.5).toLong
          val u = Sampling.dyadicUniform(id)
          val t = (2000000L - score).toDouble / 1000000.0
          val t9 = t * t * t * t * t * t * t * t * t
          val keep = t <= 0.0 || u * t9 < 1.0
          (id, s, score, keep)
        }
      }
      .toDF(idCol, "logit_micronats", "score_micro", "keep")
  }
}
