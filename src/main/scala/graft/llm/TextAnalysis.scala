package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: token counting,
  * quality scoring, language ID, document fingerprinting.
  *
  * Everything is Column expressions / higher-order functions — fully
  * codegen'd, no UDFs, no shuffle except where a groupBy is the semantics.
  * At 100 TB these run as pure map stages over the document scan.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def wsTokens(text: Column): Column = split(text, "\\s+")

  /** BPE-ish pre-tokenization: letter runs, digit runs, single punctuation —
    * the GPT-2-style regex coarsened to its portable core. `textCol` is a
    * column name (the regex lives in an expr string). */
  def bpeTokenCount(textCol: String): Column =
    size(expr(s"regexp_extract_all($textCol, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)"))

  /** Quality signals (length / punctuation / stopword ratios). Ratios are
    * divisions of exact integer counts, so results are reproducible across
    * engines. */
  def quality(df: DataFrame, text: Column): DataFrame = {
    val toks = split(text, " ")
    val nWords = size(toks)
    val stop = array(Stopwords.en.map(lit): _*)
    df
      .withColumn("n_chars", length(text).cast("long"))
      .withColumn("n_words", nWords.cast("long"))
      .withColumn("avg_word_len",
        (length(regexp_replace(text, " ", "")).cast("double") / nWords))
      .withColumn("stopword_ratio",
        size(filter(toks, t => t.isin(Stopwords.en: _*))).cast("double") / nWords)
      .withColumn("alpha_ratio",
        length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
          greatest(length(text), lit(1)))
  }

  /** Language ID: stopword-hit scoring against per-language lexicons, argmax
    * with a deterministic tie order. A coarse n-gram/stopword heuristic —
    * the shape (broadcast lexicon, map-side scoring) is what matters at
    * scale; swap lexicons for a real model feature-set without changing the
    * plan. */
  def langId(df: DataFrame, text: Column): DataFrame = {
    val toks = array_distinct(split(lower(text), "\\s+"))
    val scored = Stopwords.lexicons.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"__s_$lang", size(array_intersect(toks, array(words.map(lit): _*))))
    }
    val langs = Stopwords.lexicons.map(_._1)
    val best = langs.map(l => struct(col(s"__s_$l").as("score"), lit(l).as("lang")))
      .reduce((a, b) => when(b.getField("score") > a.getField("score"), b).otherwise(a))
    scored
      .withColumn("lang_pred", best.getField("lang"))
      .withColumn("lang_score", best.getField("score"))
      .drop(langs.map(l => s"__s_$l"): _*)
  }

  /** Document fingerprinting: winnowing over rolling word-shingle hashes
    * (Schleimer et al., SIGMOD'03): k-gram hashes → min per sliding window
    * of w → distinct fingerprint set. Shared fingerprints ⇒ shared content
    * runs; used for plagiarism-style containment detection.
    * `hashes` is the k-gram hash array column (see [[kgramHashes]]). */
  def fingerprints(hashes: Column, w: Int = 4): Column =
    array_distinct(
      when(size(hashes) <= w, array(array_min(hashes)))
        .otherwise(transform(
          sequence(lit(0), size(hashes) - w),
          j => array_min(slice(hashes, j + 1, lit(w))))))

  /** Rolling k-gram hashes of the word stream (the __fp_h input of
    * [[fingerprints]]); `textCol` is a column name. */
  def kgramHashes(textCol: String, k: Int = 3): Column =
    expr(
      s"""transform(sequence(0, greatest(size(split(lower($textCol), ' ')) - $k, 0)),
         |  i -> xxhash64(concat_ws(' ', slice(split(lower($textCol), ' '), i + 1, $k))))""".stripMargin)

  /** Full fingerprint pipeline over a DataFrame. */
  def fingerprintDocs(df: DataFrame, textCol: String, k: Int = 3, w: Int = 4): DataFrame =
    df.withColumn("__fp_h", kgramHashes(textCol, k))
      .withColumn("fingerprints", fingerprints(col("__fp_h"), w))
      .drop("__fp_h")
}

/** Per-language stopword lexicons (broadcastable literals). */
object Stopwords {
  val en = Seq("the", "of", "and", "to", "in", "is", "was", "that", "for", "on", "a")
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> en,
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "ser", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "un", "que", "pour", "dans", "est", "les"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))
}
