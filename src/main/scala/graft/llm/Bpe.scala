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
  *     map-side combined, shuffle bounded by |vocab|, never corpus size —
  *     and TRUNCATES it inside the aggregation (`minCount` frequency
  *     floor and/or `maxVocab` TakeOrdered top-V), so what reaches the
  *     driver is model-bounded even on a web corpus whose raw whitespace
  *     vocabulary is heavy-tailed and effectively unbounded;
  *  2. the merge loop runs over that truncated dict in driver memory
  *     (pair statistics only ever depend on the dict, so iterating
  *     distributed would shuffle the same dict N times for nothing);
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

  /** Per-partition encode kernel for words outside the trained dict:
    * applies the ranked merges by literal left-to-right replacement —
    * byte-identical to what [[train]] does to every dict word, so an
    * unseen word's representation equals what its dict entry WOULD have
    * been (the dict is purely a cache; truncating it never changes encode
    * output). Three costs the naive per-word merge scan pays are hoisted:
    *  - the `lhs␟rhs` / `lhsrhs` target strings build once per applier,
    *    not once per (word, merge);
    *  - a 64-bit char-set fingerprint per merge skips merges whose
    *    characters the word doesn't even contain — sound, because literal
    *    substring occurrence requires every non-Sep char of the target to
    *    be a char of the word, and replacement only ever DELETES Sep
    *    chars, so the word's fingerprint stays exact across merges;
    *  - a bounded memo (Zipf: the same words recur endlessly) caches the
    *    final representation per word, cleared wholesale at 2¹⁶ entries.
    * At a real 32k-merge table this turns the unseen-word path from 32k
    * string scans + 64k concats into 32k mask tests (~0 work) plus a
    * handful of real replaces. */
  private[llm] final class MergeApplier(merges: Seq[Merge]) {
    private val n = merges.length
    private val froms = new Array[String](n)
    private val tos = new Array[String](n)
    private val masks = new Array[Long](n)
    locally {
      var i = 0
      while (i < n) {
        val m = merges(i)
        froms(i) = m.lhs + Sep + m.rhs
        tos(i) = m.lhs + m.rhs
        masks(i) = charMask(froms(i))
        i += 1
      }
    }
    private def charMask(s: String): Long = {
      var msk = 0L
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c != Sep) msk |= 1L << (c & 63)
        i += 1
      }
      msk
    }
    private val cache = new java.util.HashMap[String, String](1 << 12)
    def repr(w: String): String = {
      val hit = cache.get(w)
      if (hit != null) return hit
      var repr = initRepr(w)
      val wm = charMask(repr)
      var i = 0
      while (i < n) {
        if ((masks(i) & ~wm) == 0L) repr = repr.replace(froms(i), tos(i))
        i += 1
      }
      if (cache.size >= (1 << 16)) cache.clear()
      cache.put(w, repr)
      repr
    }
  }

  /** Distributed word-count pass + driver merge loop. Returns the ranked
    * merge table and the final (word → representation) dict.
    *
    * The driver dict is MODEL-bounded, not corpus-bounded: `minCount`
    * floors the word frequency inside the distributed count aggregation
    * (a web corpus's whitespace vocabulary is heavy-tailed junk — every
    * production BPE trains on a frequency-truncated vocab) and `maxVocab`
    * caps it to the top V by (count DESC, word ASC) via a distributed
    * TakeOrdered, so what collects is min(V, |{w: c(w) ≥ f}|) rows no
    * matter the corpus size. Sub-floor words still encode correctly:
    * [[MergeApplier]] replays the merges, which is definitionally the
    * dict entry they would have had. The only semantic effect of the cap
    * is that truncated words don't VOTE in the pair statistics — the
    * standard contract (HF tokenizers' `min_frequency`/`vocab_size`). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 1L,
      maxVocab: Int = Int.MaxValue): (Seq[Merge], Map[String, String]) = {
    require(minCount >= 1, "minCount must be >= 1")
    require(maxVocab >= 1, "maxVocab must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val counted = df.select(col(textCol)).as[String]
      .flatMap(t => if (t == null) Iterator.empty // null doc: no words, no NPE
        else t.toLowerCase.split(" ", -1).iterator.filter(_.nonEmpty))
      .groupByKey(identity).count()
      .toDF("word", "c")
      .filter(col("c") >= minCount)
    val wc: Array[(String, Long)] =
      (if (maxVocab == Int.MaxValue) counted
       // orderBy+limit plans as TakeOrdered: per-partition top-V, V rows
       // to the driver — never a global sort of the vocabulary
       else counted.orderBy(col("c").desc, col("word")).limit(maxVocab))
        .as[(String, Long)].collect()
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
        val applier = new MergeApplier(bcM.value)
        val d = bcD.value
        it.map { case (id, text) =>
          val sb = new java.lang.StringBuilder
          var n = 0L
          var first = true
          if (text != null) // null doc: (id, 0, "") — the wordless-doc row
            text.toLowerCase.split(" ", -1).iterator.filter(_.nonEmpty).foreach { w =>
              val repr = d.getOrElse(w, applier.repr(w))
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
        val applier = new MergeApplier(bcM.value)
        val d = bcD.value
        it.map { case (id, text) =>
          var nw = 0L
          var nt = 0L
          if (text != null) text.toLowerCase.split(" ", -1).iterator.filter(_.nonEmpty)
            .foreach { w =>
              val repr = d.getOrElse(w, applier.repr(w))
              nw += 1
              nt += repr.split(Sep).length
            }
          (id, nw, nt, if (nw == 0) None else Some(nt * 1000000L / nw))
        }
      }
      .toDF(idCol, "n_words", "n_bpe_tokens", "fertility_micro")
  }
}
