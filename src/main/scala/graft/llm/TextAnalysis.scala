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
    * (Schleimer et al., SIGMOD'03): k-gram FNV hashes → min per sliding
    * window of w → distinct fingerprint set. Shared fingerprints ⇒ shared
    * content runs; used for plagiarism-style containment detection.
    *
    * Typed mapPartitions kernel: per-row scalar loops JIT to primitive
    * array code, where the equivalent transform/slice/array_min HOF chain
    * is CodegenFallback (interpreted per element — see
    * Dedup.minhashSignature). Hashing is FNV-1a (graft.llm.Hashing), so an
    * independent engine can recompute fingerprints exactly (HashOracle).
    * Output: (idCol: long, fingerprints: array<long>). */
  def fingerprintDocs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val sb = new java.lang.StringBuilder
        it.map { case (id, text) =>
          val toks = text.toLowerCase.split(" ", -1)
          val n = math.max(toks.length - k, 0) + 1
          val hs = new Array[Long](n)
          var i = 0
          while (i < n) {
            sb.setLength(0)
            var t = 0
            while (t < k && i + t < toks.length) {
              if (t > 0) sb.append(' ')
              sb.append(toks(i + t))
              t += 1
            }
            hs(i) = Hashing.hashString(sb)
            i += 1
          }
          val fps =
            if (n <= w) Array(hs.min)
            else {
              val wins = new Array[Long](n - w + 1)
              var j = 0
              while (j <= n - w) {
                var m = Long.MaxValue
                var x = j
                while (x < j + w) { if (hs(x) < m) m = hs(x); x += 1 }
                wins(j) = m
                j += 1
              }
              wins.distinct
            }
          (id, fps)
        }
      }
      .toDF(idCol, "fingerprints")
  }
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
