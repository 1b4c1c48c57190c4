package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo, "Subword Regularization", ACL
  * 2018 — the SentencePiece unigram model): the OTHER trained
  * tokenizer family next to [[Bpe]]. Where BPE composes greedily from
  * merges, unigram starts from a large seed vocabulary and runs EM —
  * the E-step computes each piece's expected count under the lattice
  * of all segmentations (forward–backward), the M-step renormalizes —
  * then prunes to the target size; encoding is Viterbi (the single
  * best segmentation under the final piece probabilities).
  *
  * Scale shape — the same two-phase split as [[Bpe.train]], for the
  * same reason: ONE distributed pass collapses the corpus to a
  * truncated (word, count) dict (map-side combined, shuffle bounded by
  * |vocab|, minCount/maxVocab truncation inside the aggregation), and
  * EM runs over that dict in driver memory — the statistics depend
  * only on the dict, so a distributed E-step would shuffle the same
  * dict every iteration for nothing. Encode broadcasts the final
  * piece table and runs as a pure typed map stage over the scan.
  *
  * Determinism contract (what the fixture pins): seed = all substrings
  * of dict words up to `maxPieceLen` with aggregated count ≥ minCount,
  * plus every single character (coverage floor — Viterbi never gets
  * stuck); EM in log space; pruning keeps single chars always and the
  * top `vocabSize` multi-char pieces by probability (ties by piece
  * string); Viterbi ties prefer the LONGER last piece, then the
  * lexicographically smaller one. The oracle does not replay EM —
  * instead the fixture corpus is built so the converged segmentation
  * is analytically forced (see q_unigram_encode), and UnigramSpec pins
  * the mechanics (likelihood monotonicity, coverage, prune behavior).
  */
object Unigram {

  /** `logp` maps piece → log probability; `likTrace` is the corpus
    * log-likelihood measured at the START of each EM iteration (under
    * the previous iteration's probabilities) — EM guarantees it
    * non-decreasing, which UnigramSpec asserts. */
  case class UnigramModel(logp: Map[String, Double], likTrace: Seq[Double]) {
    def pieces: Int = logp.size
  }

  /** One distributed pass → truncated (word, count) dict. Lowercased
    * whitespace tokens, same normalization as [[Bpe.train]]. */
  private def wordDict(df: DataFrame, textCol: String, minCount: Long,
      maxVocab: Int): Seq[(String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .as[(String, Long)]
      .collect()
      .toSeq
  }

  private def logSumExp(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }

  /** EM over the dict. Returns the pruned model. */
  def train(df: DataFrame, textCol: String, vocabSize: Int = 512,
      maxPieceLen: Int = 4, iters: Int = 4, minCount: Long = 2L,
      maxVocab: Int = 100000): UnigramModel = {
    val dict = wordDict(df, textCol, minCount, maxVocab)
    // seed: substrings ≤ maxPieceLen with count floor, plus all chars
    val seedCounts = scala.collection.mutable.HashMap.empty[String, Long]
    dict.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val p = w.substring(i, i + l)
          seedCounts.update(p, seedCounts.getOrElse(p, 0L) + c)
          l += 1
        }
        i += 1
      }
    }
    var vocab: Map[String, Double] = {
      val kept = seedCounts.filter { case (p, c) => p.length == 1 || c >= minCount }
      val total = kept.values.map(_.toDouble).sum
      kept.map { case (p, c) => p -> math.log(c.toDouble / total) }.toMap
    }
    var it = 0
    val trace = Seq.newBuilder[Double]
    while (it < iters) {
      // E-step: forward-backward per dict word
      val expected = scala.collection.mutable.HashMap.empty[String, Double]
      var lik = 0.0
      dict.foreach { case (w, c) =>
        val n = w.length
        val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
        val beta = Array.fill(n + 1)(Double.NegativeInfinity)
        alpha(0) = 0.0; beta(n) = 0.0
        var i = 1
        while (i <= n) {
          var l = 1
          while (l <= maxPieceLen && l <= i) {
            vocab.get(w.substring(i - l, i)).foreach { lp =>
              alpha(i) = logSumExp(alpha(i), alpha(i - l) + lp)
            }
            l += 1
          }
          i += 1
        }
        i = n - 1
        while (i >= 0) {
          var l = 1
          while (l <= maxPieceLen && i + l <= n) {
            vocab.get(w.substring(i, i + l)).foreach { lp =>
              beta(i) = logSumExp(beta(i), lp + beta(i + l))
            }
            l += 1
          }
          i -= 1
        }
        val z = alpha(n)
        if (z != Double.NegativeInfinity) {
          lik += c * z
          var j = 0
          while (j < n) {
            var l = 1
            while (l <= maxPieceLen && j + l <= n) {
              val p = w.substring(j, j + l)
              vocab.get(p).foreach { lp =>
                val post = alpha(j) + lp + beta(j + l) - z
                if (post > -30.0)
                  expected.update(p, expected.getOrElse(p, 0.0) + c * math.exp(post))
              }
              l += 1
            }
            j += 1
          }
        }
      }
      // M-step (chars keep an epsilon floor so coverage never dies)
      val floor = 1e-6
      val withFloor = vocab.keysIterator.map { p =>
        val e = expected.getOrElse(p, 0.0)
        p -> (if (p.length == 1) math.max(e, floor) else e)
      }.filter { case (p, e) => e > 0.0 }.toMap
      val total = withFloor.values.sum
      vocab = withFloor.map { case (p, e) => p -> math.log(e / total) }
      trace += lik
      it += 1
    }
    // prune: all single chars + top multi-char pieces
    val multis = vocab.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, lp) => (-lp, p) }.take(vocabSize)
    UnigramModel((vocab.filter(_._1.length == 1) ++ multis).toMap, trace.result())
  }

  /** Viterbi segmentation of one word. Deterministic ties: longer last
    * piece wins (two candidates of EQUAL length ending at the same
    * position are the identical substring, so no further rule is
    * needed). Characters outside the model fall back to a large
    * negative score (emitted as single-char tokens), so encode is
    * total. */
  private[graft] def viterbi(w: String, logp: Map[String, Double],
      maxPieceLen: Int): Seq[String] = {
    val n = w.length
    if (n == 0) return Nil
    val unk = -1e4
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val bp = Array.fill(n + 1)(0)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= maxPieceLen && l <= i) {
        val piece = w.substring(i - l, i)
        val lp = logp.getOrElse(piece, if (l == 1) unk else Double.NegativeInfinity)
        if (lp != Double.NegativeInfinity && best(i - l) != Double.NegativeInfinity) {
          val cand = best(i - l) + lp
          val better = cand > best(i) || (cand == best(i) && l > bp(i))
          if (better) { best(i) = cand; bp(i) = l }
        }
        l += 1
      }
      i += 1
    }
    // reconstruct
    val out = List.newBuilder[String]
    val stack = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) { stack += w.substring(pos - bp(pos), pos); pos -= bp(pos) }
    stack.reverseIterator.foreach(out += _)
    out.result()
  }

  /** Distributed encode: per-doc token list (over lowercased
    * whitespace words, in order) against the broadcast model. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      model: UnigramModel, maxPieceLen: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model.logp)
    val mpl = maxPieceLen
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val words = (if (text == null) "" else text).toLowerCase
          .split("\\s+").filter(_.nonEmpty)
        val toks = words.flatMap(w => viterbi(w, bc.value, mpl))
        (id, toks.length.toLong, toks.mkString("|"))
      }
      .toDF(idCol, "n_tokens", "segmented")
  }
}
