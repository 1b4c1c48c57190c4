package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WordPiece encoding (round 14): the BERT-family tokenizer — the
  * third subword family next to [[Bpe]] (merge-list) and [[Unigram]]
  * (likelihood/Viterbi). Deployment pipelines ENCODE against a shipped
  * vocabulary (vocab.txt), so that is the operator: greedy
  * longest-match-first segmentation with the `##` continuation-piece
  * convention, and BERT's whole-word `[UNK]` fallback when any suffix
  * of a word cannot be covered (Devlin et al. 2019; the tokenizer
  * itself is Schuster & Nakajima 2012).
  *
  * Algorithm (the reference greedy form): at each position take the
  * LONGEST vocabulary piece matching the remaining word — looked up
  * plain at position 0 and with the `##` prefix after it; if no piece
  * matches at some position, the WHOLE word becomes `[UNK]` (not a
  * partial segmentation — matching BERT's WordpieceTokenizer, where a
  * bad tail invalidates the word).
  *
  * Oracle strategy (what makes the greedy process exactly replayable):
  * the fixture BUILDS words by concatenating vocabulary pieces whose
  * construction makes greedy provably recover the build — every
  * multi-char piece ends in a terminator letter that appears nowhere
  * else inside a piece, so no vocabulary entry can span a piece
  * boundary, and longest-match at each boundary is exactly the built
  * piece. The DuckDB side then replays the CONSTRUCTION, not the
  * search.
  *
  * Scale shape: pure map stage over the scan against a broadcast
  * vocabulary (a vocab is model data — 30k entries, never
  * corpus-sized); per-word cost is O(len²) worst case with len capped
  * by `maxWordLen` (BERT caps at 100 — longer tokens are noise, and
  * the cap bounds adversarial input).
  *
  * Reference scope: kafi has no tokenizer surface; LLM-pipeline
  * extension breadth, sibling to [[Bpe]]/[[Unigram]].
  */
object Wordpiece {

  /** Greedy longest-match segmentation of one word. Returns the piece
    * list, or None when the word cannot be covered (→ [UNK]). */
  private[graft] def segment(word: String, vocab: Set[String],
      maxWordLen: Int = 100): Option[Seq[String]] = {
    if (word.isEmpty) return Some(Nil)
    if (word.length > maxWordLen) return None // BERT's long-token guard
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      var end = word.length
      var found: String = null
      while (found == null && end > pos) {
        val cand =
          if (pos == 0) word.substring(0, end)
          else "##" + word.substring(pos, end)
        if (vocab.contains(cand)) found = cand
        else end -= 1
      }
      if (found == null) return None
      out += found
      pos = end
    }
    Some(out.result())
  }

  /** Distributed encode: lowercased whitespace words, in order, against
    * the broadcast vocabulary. Output: (idCol, word_idx, word,
    * n_pieces, pieces '|'-joined); an uncoverable word emits
    * ([UNK], 1, "[UNK]"). */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String], maxWordLen: Int = 100): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab.toSet)
    val mwl = maxWordLen
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val words = (if (text == null) "" else text).toLowerCase
          .split("\\s+").filter(_.nonEmpty)
        words.iterator.zipWithIndex.map { case (w, i) =>
          segment(w, bc.value, mwl) match {
            case Some(ps) => (id, i, w, ps.length.toLong, ps.mkString("|"))
            case None => (id, i, w, 1L, "[UNK]")
          }
        }
      }
      .toDF(idCol, "word_idx", "word", "n_pieces", "pieces")
  }
}
