package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016) — trained on
  * the corpus, applied as a map stage. The engine's token COUNTING ops
  * estimate; this is the real merge-table tokenizer a training pipeline
  * budgets sequence lengths with.
  *
  * Shape for 100 TB — the two-phase split every production BPE trainer
  * uses (HF tokenizers' `train_from_iterator` does exactly this):
  *  1. ONE distributed pass collapses the corpus to a (word, count) dict —
  *     map-side combined, shuffle bounded by |vocab|, never corpus size;
  *  2. the merge loop runs over that dict in driver memory (|vocab| rows —
  *     bounded at any corpus scale; pair statistics only ever depend on
  *     the dict, so iterating distributed would shuffle the same dict N
  *     times for nothing);
  *  3. encode broadcasts the learned merges + final dict and runs as a
  *     pure typed map stage over the document scan.
  *
  * Determinism contract (the DuckDB oracle replays the whole chain):
  * words are lowercased space-tokens (empties dropped); a word's initial
  * representation is its code points joined by the 0x1f separator; each
  * round counts ADJACENT symbol pairs weighted by word count, picks the
  * (count DESC, left ASC, right ASC) argmax, and rewrites every word by
  * literal left-to-right non-overlapping replacement of `left␟right` with
  * `left+right` — `String.replace` and DuckDB `replace` share those
  * semantics exactly. Training stops early when no pairs remain.
  */
object Bpe {

  val Sep: Char = '\u001f'

  final case class Merge(rank: Long, lhs: String, rhs: String)

  /** Code points of `w` joined by [[Sep]]. */
  private def initRepr(w: String): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      if (i > 0) sb.append(Sep)
      sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Apply ranked merges in order to one word representation. */
  private def applyMerges(repr0: String, merges: Seq[Merge]): String = {
    var repr = repr0
    merges.foreach { m =>
      repr = repr.replace(m.lhs + Sep + m.rhs, m.lhs + m.rhs)
    }
    repr
  }

  /** Distributed word-count pass + driver merge loop. Returns the ranked
    * merge table and the final (word → representation) dict. */
  def train(df: DataFrame, textCol: String,
      numMerges: Int): (Seq[Merge], Map[String, String]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val wc: Array[(String, Long)] = df.select(col(textCol)).as[String]
      .flatMap(_.toLowerCase.split(" ", -1).iterator.filter(_.nonEmpty))
      .groupByKey(identity).count().collect()
    var dict: Array[(String, String, Long)] = // (word, repr, count)
      wc.map { case (w, c) => (w, initRepr(w), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0L
    var done = false
    while (r < numMerges && !done) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((_, repr, c) <- dict) {
        val syms = repr.split(Sep)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairs.update(k, pairs.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((l, rr), _) = pairs.minBy { case ((l, rr), c) => (-c, l, rr) }
        merges += Merge(r, l, rr)
        val from = l + Sep + rr
        val to = l + rr
        dict = dict.map { case (w, repr, c) => (w, repr.replace(from, to), c) }
        r += 1
      }
    }
    (merges.toSeq, dict.map { case (w, repr, _) => (w, repr) }.toMap)
  }

  /** The merge table as a DataFrame: (rank, lhs, rhs). */
  def mergesDF(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "lhs", "rhs")
  }

  /** Tokenize every document with the trained merges: pure map stage
    * against the broadcast (merges, dict). Dict hits read the final
    * representation directly; unseen words (generalization — encode corpus
    * need not be the training corpus) apply the merges in rank order.
    * Output: (idCol, n_bpe_tokens, tokens_str) — tokens_str joins each
    * word's ␟-separated tokens with a space (words never contain either),
    * so the full tokenization is value-comparable, not just counted. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge], dict: Map[String, String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bcM = spark.sparkContext.broadcast(merges)
    val bcD = spark.sparkContext.broadcast(dict)
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val ms = bcM.value
        val d = bcD.value
        it.map { case (id, text) =>
          val words = text.toLowerCase.split(" ", -1).iterator.filter(_.nonEmpty)
          val sb = new java.lang.StringBuilder
          var n = 0L
          var first = true
          words.foreach { w =>
            val repr = d.getOrElse(w, applyMerges(initRepr(w), ms))
            if (!first) sb.append(' ')
            sb.append(repr)
            n += repr.split(Sep).length
            first = false
          }
          (id, n, sb.toString)
        }
      }
      .toDF(idCol, "n_bpe_tokens", "tokens_str")
  }

  /** Tokenizer-QA fertility metrics — tokens-per-word is THE standard
    * figure for how well a vocabulary fits a corpus (high fertility =
    * the tokenizer fragments this text; the signal behind per-language
    * vocabulary sizing). Same kernel as [[encode]] plus a word counter:
    * `fertility_micro` = ⌊n_bpe_tokens·10⁶ / n_words⌋ (integer division —
    * exact in any engine; NULL for wordless docs). Pure broadcast-model
    * map stage. Output: (idCol, n_words, n_bpe_tokens, fertility_micro). */
  def encodeStats(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge], dict: Map[String, String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bcM = spark.sparkContext.broadcast(merges)
    val bcD = spark.sparkContext.broadcast(dict)
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val ms = bcM.value
        val d = bcD.value
        it.map { case (id, text) =>
          var nw = 0L
          var nt = 0L
          if (text != null) text.toLowerCase.split(" ", -1).iterator.filter(_.nonEmpty)
            .foreach { w =>
              val repr = d.getOrElse(w, applyMerges(initRepr(w), ms))
              nw += 1
              nt += repr.split(Sep).length
            }
          (id, nw, nt, if (nw == 0) None else Some(nt * 1000000L / nw))
        }
      }
      .toDF(idCol, "n_words", "n_bpe_tokens", "fertility_micro")
  }
}
