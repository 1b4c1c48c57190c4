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

  /** Language-model perplexity scoring — the CCNet move (Wenzek et al.,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", LREC 2020): score every document by how surprising it is under
    * an n-gram model trained on a trusted reference corpus (CCNet uses a
    * Wikipedia KenLM; here an add-one-smoothed bigram model, the same
    * decision signal without the ARPA machinery). Low mean surprisal ≈
    * fluent prose; high ≈ boilerplate, gibberish, wrong language.
    *
    * Model: p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V) over lowercased
    * space-tokens of `reference`, V = |reference vocab|. Per-document
    * score = Σ surprisal over adjacent token pairs, where each term is
    * floor(ln((c(w1)+V)/(c(w1,w2)+1)) · 1e6 + 0.5) — an integer number of
    * MICRO-NATS. Rounding each term to an integer makes the per-doc sum
    * order-free and exactly reproducible (a plain double fold would depend
    * on summation order); a 1-ulp `ln` difference cannot flip a 1e-6
    * rounding except within 1 ulp of a half-boundary, which ln of a
    * rational never hits (only ln(1) = 0 is exact, and 0 rounds stably).
    *
    * Scale shape: the reference corpus is SMALL by design (CCNet's is one
    * language's Wikipedia) — its counts collect to the driver and
    * broadcast, bounded by |reference| not |corpus|; scoring is then a
    * pure map stage over the document scan. Output: every `df` column is
    * dropped except the id — (idCol, n_terms, surprisal_micronats,
    * mean_nats = surprisal/1e6/n_terms, NULL when the doc has < 2
    * tokens). */
  def lmScore(df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // r15 optimization: both gram orders counted in ONE reference pass
    // (one scan + one shuffle + one collect instead of two of each);
    // counts are bit-identical, the (order, gram) key just splits back
    // into the two maps the scorer broadcasts
    val counts = reference.select(col(refTextCol)).as[String]
      .flatMap { t =>
        if (t == null) Iterator.empty
        else {
          val w = t.toLowerCase.split(" ", -1)
          w.iterator.map((1, _)) ++
            (0 until w.length - 1).iterator.map(i => (2, w(i) + " " + w(i + 1)))
        }
      }
      .groupByKey(identity).count().collect()
    val uni = counts.collect { case ((1, g), c) => g -> c }.toMap
    val bi = counts.collect { case ((2, g), c) => g -> c }.toMap
    val vocab = uni.size.toLong
    // an empty vocab would make every term ln(0) = -Inf → Long.MinValue →
    // wrap-around garbage sums; fail fast instead
    require(vocab > 0, "LM reference corpus is empty — nothing to train on")
    val sc = spark.sparkContext
    val bcU = sc.broadcast(uni)
    val bcB = sc.broadcast(bi)
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val u = bcU.value
        val b = bcB.value
        it.map { case (id, text) =>
          if (text == null) (id, 0L, 0L, None: Option[Double])
          else {
          val w = text.toLowerCase.split(" ", -1)
          val nT = math.max(w.length - 1, 0).toLong
          var s = 0L
          var i = 0
          while (i < w.length - 1) {
            val cu = u.getOrElse(w(i), 0L)
            val cb = b.getOrElse(w(i) + " " + w(i + 1), 0L)
            s += math.floor(
              math.log((cu + vocab).toDouble / (cb + 1).toDouble) * 1000000.0 + 0.5).toLong
            i += 1
          }
          (id, nT, s, if (nT > 0) Some(s.toDouble / 1000000.0 / nT) else None)
          }
        }
      }
      .toDF(idCol, "n_terms", "surprisal_micronats", "mean_nats")
  }

  /** Trigram form of [[lmScore]] — the sharper fluency signal (CCNet's
    * KenLM is a 5-gram; a trigram is the honest middle ground a closed
    * replay can carry). Model: p(w3 | w1 w2) = (c3 + 1) / (c2 + V) where
    * c3 counts the trigram in the reference, c2 = Σ_w3 c3 counts the
    * CONTEXT (the pair as a trigram prefix — derived from the trigram
    * counts, so both engines agree by construction), and V is the
    * reference's unigram vocabulary. Same integer micro-nat surprisal
    * contract; docs with < 3 tokens have no terms (NULL mean). Same
    * reference-bounded broadcast + pure-map-stage shape. */
  def lmScoreTrigram(df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // r15 optimization: vocabulary size and trigram counts in ONE
    // reference pass (the separate distinct().count() re-scanned and
    // re-shuffled the reference just for V); values are identical —
    // V = #distinct unigram keys, tri = the order-3 slice
    val counts = reference.select(col(refTextCol)).as[String]
      .flatMap { t =>
        if (t == null) Iterator.empty
        else {
          val w = t.toLowerCase.split(" ", -1)
          w.iterator.map((1, _)) ++
            (0 until w.length - 2).iterator.map(i =>
              (3, w(i) + " " + w(i + 1) + " " + w(i + 2)))
        }
      }
      .groupByKey(identity).count().collect()
    val vocab = counts.count(_._1._1 == 1).toLong
    require(vocab > 0, "LM reference corpus is empty — nothing to train on")
    val tri = counts.collect { case ((3, g), c) => g -> c }.toMap
    val ctx: Map[String, Long] = tri.groupMapReduce { case (k, _) =>
      k.substring(0, k.lastIndexOf(' '))
    }(_._2)(_ + _)
    val sc = spark.sparkContext
    val bcT = sc.broadcast(tri)
    val bcC = sc.broadcast(ctx)
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val t3 = bcT.value
        val c2 = bcC.value
        it.map { case (id, text) =>
          if (text == null) (id, 0L, 0L, None: Option[Double])
          else {
          val w = text.toLowerCase.split(" ", -1)
          val nT = math.max(w.length - 2, 0).toLong
          var s = 0L
          var i = 0
          while (i < w.length - 2) {
            val pair = w(i) + " " + w(i + 1)
            val cc = c2.getOrElse(pair, 0L)
            val ct = t3.getOrElse(pair + " " + w(i + 2), 0L)
            s += math.floor(
              math.log((cc + vocab).toDouble / (ct + 1).toDouble) * 1000000.0 + 0.5).toLong
            i += 1
          }
          (id, nT, s, if (nT > 0) Some(s.toDouble / 1000000.0 / nT) else None)
          }
        }
      }
      .toDF(idCol, "n_terms", "surprisal_micronats", "mean_nats")
  }

  /** Stupid-backoff order-3 LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" §4) — the order-n upgrade
    * of [[lmScore]] toward CCNet's 5-gram KenLM (VERDICT r14 task 6).
    * Every token is scored at the LONGEST available context (trigram →
    * bigram → unigram); a miss backs off one order and multiplies the
    * score by α = 0.4, i.e. adds ln(2.5) per level to the surprisal:
    *
    *   S(w | ctx_k) = c_k(ngram)/c_k(context)   when c_k(ngram) > 0
    *                = 0.4 · S(w | ctx_{k-1})    otherwise,
    *   S(w)         = (c1(w)+1)/(N+V)           (add-one floor, total)
    *
    * Context counts are DERIVED from the k-gram counts (prefix sums),
    * so numerator ≤ denominator by construction — the
    * [[lmScoreTrigram]] consistency rule. Integer determinism: with
    * 2.5^L = 5^L/2^L each term is ONE log of a ratio of integers,
    * floor(ln((den·5^L)/(num·2^L))·1e6 + 0.5) micro-nats — the exact
    * replay contract the whole lm family rides. n_terms = the token
    * count (every token scores; unigram-only docs are no longer
    * unscorable the way the bigram form left them).
    *
    * Scale shape: identical to [[lmScore]] — reference-bounded counts
    * collect and broadcast, scoring is a pure map stage. */
  def lmScoreBackoff(df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def toks(t: String): Array[String] =
      if (t == null) Array.empty else t.toLowerCase.split(" ", -1)
    // r15 optimization: all three gram orders counted in ONE reference
    // pass (one scan + one shuffle + one collect, where three sequential
    // grams(n) actions each re-scanned and re-shuffled the reference).
    // Same counts bit-for-bit — the (order, gram) key splits back into
    // the three maps the scorer broadcasts.
    val counts = reference.select(col(refTextCol)).as[String]
      .flatMap { t =>
        val w = toks(t)
        (1 to 3).iterator.flatMap(n =>
          (0 to w.length - n).iterator.map(i => (n, w.slice(i, i + n).mkString(" "))))
      }
      .groupByKey(identity).count().collect()
    val uni = counts.collect { case ((1, g), c) => g -> c }.toMap
    val vocab = uni.size.toLong
    require(vocab > 0, "LM reference corpus is empty — nothing to train on")
    val nTok = uni.valuesIterator.sum
    val bi = counts.collect { case ((2, g), c) => g -> c }.toMap
    val tri = counts.collect { case ((3, g), c) => g -> c }.toMap
    def prefixCounts(m: Map[String, Long]): Map[String, Long] =
      m.groupMapReduce { case (k, _) => k.substring(0, k.lastIndexOf(' ')) }(_._2)(_ + _)
    val biCtx = prefixCounts(bi)
    val triCtx = prefixCounts(tri)
    val sc = spark.sparkContext
    val bcU = sc.broadcast(uni)
    val bcB = sc.broadcast(bi)
    val bcBc = sc.broadcast(biCtx)
    val bcT = sc.broadcast(tri)
    val bcTc = sc.broadcast(triCtx)
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val u = bcU.value; val b = bcB.value; val bc = bcBc.value
        val t3 = bcT.value; val tc = bcTc.value
        // α^L = (2/5)^L as an integer num/den pair folded into the ratio
        val p5 = Array(1L, 5L, 25L)
        val p2 = Array(1L, 2L, 4L)
        def term(num: Long, den: Long, l: Int): Long =
          math.floor(math.log((den * p5(l)).toDouble / (num * p2(l)).toDouble)
            * 1000000.0 + 0.5).toLong
        it.map { case (id, text) =>
          if (text == null) (id, 0L, 0L, None: Option[Double])
          else {
            val w = text.toLowerCase.split(" ", -1)
            var s = 0L
            var i = 0
            while (i < w.length) {
              var done = false
              var l = 0
              if (i >= 2) {
                val ng = w(i - 2) + " " + w(i - 1) + " " + w(i)
                val c = t3.getOrElse(ng, 0L)
                if (c > 0) { s += term(c, tc(w(i - 2) + " " + w(i - 1)), 0); done = true }
                else l = 1
              }
              if (!done && i >= 1) {
                val ng = w(i - 1) + " " + w(i)
                val c = b.getOrElse(ng, 0L)
                if (c > 0) { s += term(c, bc(w(i - 1)), l); done = true }
                else l += 1
              }
              if (!done)
                s += term(u.getOrElse(w(i), 0L) + 1, nTok + vocab, l)
              i += 1
            }
            val nT = w.length.toLong
            (id, nT, s, if (nT > 0) Some(s.toDouble / 1000000.0 / nT) else None)
          }
        }
      }
      .toDF(idCol, "n_terms", "surprisal_micronats", "mean_nats")
  }

  /** Bounded top-k terms per document by (score desc, term asc) — the
    * many-docs ranking shape (the [[Ann.TopKAgg]] pattern with a string
    * payload): per-task state ≤ k entries per local doc, never a window
    * partitioned by doc_id. Buffer entries carry (score, term, tf, df). */
  private class TopTermsAgg(k: Int) extends org.apache.spark.sql.expressions.Aggregator[
      (Long, String, Long, Long, Long), List[(Long, String, Long, Long)],
      Seq[(Long, String, Long, Long)]] {
    private def better(a: (Long, String, Long, Long), b: (Long, String, Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def insert(buf: List[(Long, String, Long, Long)],
        e: (Long, String, Long, Long)): List[(Long, String, Long, Long)] = {
      val (pre, post) = buf.span(better(_, e))
      val merged = pre ::: e :: post
      if (merged.length > k) merged.take(k) else merged
    }
    def zero: List[(Long, String, Long, Long)] = Nil
    def reduce(buf: List[(Long, String, Long, Long)],
        a: (Long, String, Long, Long, Long)): List[(Long, String, Long, Long)] =
      insert(buf, (a._5, a._2, a._3, a._4))
    def merge(x: List[(Long, String, Long, Long)],
        y: List[(Long, String, Long, Long)]): List[(Long, String, Long, Long)] =
      y.foldLeft(x)(insert)
    def finish(buf: List[(Long, String, Long, Long)]): Seq[(Long, String, Long, Long)] = buf
    def bufferEncoder: org.apache.spark.sql.Encoder[List[(Long, String, Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, String, Long, Long)]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Long, String, Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, String, Long, Long)]]()
  }

  /** TF-IDF top-k terms per document — keyword extraction for topic
    * tagging / corpus exploration. Scores are EXACT integers: idf rounds
    * once to micro-nats (floor(ln(N/df)·1e6 + 0.5), the [[lmScore]]
    * robustness trick) and score = tf · idf_micronat is exact long
    * arithmetic, so ranking is identical across engines — no float
    * comparison anywhere.
    *
    * Scale shape: tf is one map-side-combined groupBy on (doc, term); df
    * aggregates the tf rows again on term (slim); the df join shuffles on
    * term; ranking is the bounded [[TopTermsAgg]], never a window over
    * doc_id (the per-doc candidate set is the doc's distinct terms, but a
    * window would still collapse parallelism to |docs| partitions and
    * materialize every doc's terms before ranking). N (total docs) is one
    * driver scalar. Output: (idCol, term, tf, df, score, rank ≤ k). */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tok = df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null) Iterator.empty // null doc: no terms, no NPE
        else text.toLowerCase.split(" ", -1).iterator.map(t => (id, t))
      }
      .toDF("__id", "term")
    val tf = tok.groupBy("__id", "term").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.count()
    val scored = tf.join(dfc, Seq("term"))
      .withColumn("score",
        col("tf") * floor(log(lit(n.toDouble) / col("df")) * 1000000.0 + 0.5).cast("long"))
    scored.select(col("__id"), col("term"), col("tf"), col("df"), col("score"))
      .as[(Long, String, Long, Long, Long)]
      .groupByKey(_._1)
      .agg(new TopTermsAgg(k).toColumn)
      .flatMap { case (id, top) =>
        top.iterator.zipWithIndex.map { case ((score, term, tf, dfv), i) =>
          (id, term, tf, dfv, score, (i + 1).toLong)
        }
      }
      .toDF(idCol, "term", "tf", "df", "score", "rank")
  }

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

  /** Unicode-script profile (round 13): per-document character counts
    * by script block plus the dominant script — the script-mix filter a
    * multilingual curation pipeline applies before language ID (a doc
    * whose script histogram disagrees with its claimed language, or
    * that mixes scripts heavily, is usually markup debris or spam; the
    * FineWeb/Dolma pipelines gate on exactly this signal). Ranges are
    * the core Unicode blocks: Latin = ASCII letters + Latin-1/Extended
    * (U+00C0–U+024F), Cyrillic U+0400–U+04FF, Greek U+0370–U+03FF,
    * Arabic U+0600–U+06FF, CJK = unified ideographs U+4E00–U+9FFF +
    * kana U+3040–U+30FF + hangul U+AC00–U+D7AF. Dominance ties break
    * by that fixed column order (deterministic, fixture-pinned).
    *
    * Pure typed map stage — a per-code-point integer walk, no shuffle;
    * the DuckDB oracle replays planted per-script counts closed-form. */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val t = if (text == null) "" else text
        var latin, cyr, greek, arabic, cjk, digit, space, other = 0L
        var i = 0
        while (i < t.length) {
          val cp = t.codePointAt(i)
          if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
            (cp >= 0xC0 && cp <= 0x24F)) latin += 1
          else if (cp >= 0x400 && cp <= 0x4FF) cyr += 1
          else if (cp >= 0x370 && cp <= 0x3FF) greek += 1
          else if (cp >= 0x600 && cp <= 0x6FF) arabic += 1
          else if ((cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3040 && cp <= 0x30FF) ||
            (cp >= 0xAC00 && cp <= 0xD7AF)) cjk += 1
          else if (cp >= '0' && cp <= '9') digit += 1
          else if (Character.isWhitespace(cp)) space += 1
          else other += 1
          i += Character.charCount(cp)
        }
        val counts = Seq("latin" -> latin, "cyrillic" -> cyr, "greek" -> greek,
          "arabic" -> arabic, "cjk" -> cjk)
        val main = counts.maxBy(_._2) match {
          case (_, 0L) => "none"
          case (name, _) => name
        }
        (id, latin, cyr, greek, arabic, cjk, digit, space, other, main)
      })
      .toDF(idCol, "n_latin", "n_cyrillic", "n_greek", "n_arabic", "n_cjk",
        "n_digit", "n_space", "n_other", "main_script")
  }

  /** Abbreviations whose trailing period never ends a sentence (the
    * usual rule-based splitter list; lowercased, period-stripped). */
  private val sentenceAbbrevs: Set[String] = Set(
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "no", "vs",
    "etc", "e.g", "i.e", "cf", "fig", "dept", "inc", "ltd", "co")

  /** Rule-based sentence splitting (round 13): the boundary unit for
    * decontamination windows, C4-style sentence accounting, and
    * boundary-aware chunking. Deterministic contract, fixture-pinned:
    * a boundary is a run of [.!?] followed by whitespace followed by
    * an uppercase letter, digit, or quote — UNLESS the token ending at
    * the period is a known abbreviation or a single letter (initials).
    * Decimal points never match (no whitespace after the dot); the
    * trailing remainder is the last sentence. Pure typed flatMap. */
  private[graft] def splitSentences(text: String): Seq[String] = {
    val t = if (text == null) "" else text
    val out = Seq.newBuilder[String]
    var start = 0
    var i = 0
    val n = t.length
    def emit(end: Int): Unit = {
      val s = t.substring(start, end).trim
      if (s.nonEmpty) out += s
      start = end
    }
    while (i < n) {
      val c = t.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        var j = i
        while (j + 1 < n && ".!?".indexOf(t.charAt(j + 1)) >= 0) j += 1
        var k = j + 1
        while (k < n && Character.isWhitespace(t.charAt(k))) k += 1
        val isBoundary = k > j + 1 && k < n && {
          val nxt = t.charAt(k)
          Character.isUpperCase(nxt) || Character.isDigit(nxt) ||
            nxt == '"' || nxt == '\''
        } && {
          // the token ending at the FIRST terminator of the run
          var w = i - 1
          while (w >= 0 && !Character.isWhitespace(t.charAt(w))) w -= 1
          val tok = t.substring(w + 1, i).toLowerCase
          !(c == '.' && (sentenceAbbrevs.contains(tok) ||
            (tok.length == 1 && Character.isLetter(tok.charAt(0)))))
        }
        if (isBoundary) { emit(j + 1); i = k } else i = j + 1
      } else i += 1
    }
    emit(n)
    out.result()
  }

  def sentences(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        splitSentences(text).zipWithIndex.map { case (s, ix) => (id, ix, s) }
      }
      .toDF(idCol, "sent_idx", "sentence")
  }

  /** Syllable estimate for one word (the standard readability
    * heuristic): count maximal vowel groups (aeiouy) over the letters,
    * subtract one for a trailing silent 'e' when more than one group
    * remains, floor at 1. Deterministic; documented approximation. */
  private[graft] def syllables(word: String): Int = {
    val w = word.toLowerCase.filter(c => c >= 'a' && c <= 'z')
    if (w.isEmpty) return 0
    var groups = 0
    var inGroup = false
    w.foreach { c =>
      val vowel = "aeiouy".indexOf(c) >= 0
      if (vowel && !inGroup) groups += 1
      inGroup = vowel
    }
    if (w.endsWith("e") && !w.endsWith("le") && groups > 1) groups -= 1
    math.max(groups, 1)
  }

  /** Flesch–Kincaid grade level (Kincaid et al. 1975): the classic
    * readability gate — 0.39·(words/sentences) + 11.8·(syllables/
    * words) − 15.59, over [[splitSentences]] and the whitespace word
    * split. Counts floor at 1 so empty docs score finitely. The
    * formula is evaluated in the same IEEE double expression order the
    * oracle uses (the interpolation-join precedent), so the compare is
    * exact. Pure typed map stage. */
  def fleschKincaid(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val t = if (text == null) "" else text
        val nS = math.max(splitSentences(t).length, 1)
        val words = t.split("\\s+").filter(_.nonEmpty)
        val nW = math.max(words.length, 1)
        val nY = words.map(syllables).sum
        val grade = 0.39 * (nW.toDouble / nS) + 11.8 * (nY.toDouble / nW) - 15.59
        (id, nS.toLong, nW.toLong, nY.toLong, grade)
      })
      .toDF(idCol, "n_sentences", "n_words", "n_syllables", "fk_grade")
  }

  /** Mojibake repair: text that was UTF-8 on disk but decoded as
    * Latin-1 somewhere upstream shows the classic "Ã©"/"â€™" digraphs.
    * The repair is exact, not heuristic: re-encode the STRING as
    * Latin-1 bytes and strictly re-decode as UTF-8 — applied only when
    * (a) the text contains a mojibake marker (Ã/Â/â followed by a
    * high-half char) and (b) the strict re-decode succeeds and (c) the
    * round-trip is byte-faithful (every char fits Latin-1). Clean text
    * fails (a) and passes through untouched; genuinely mixed text
    * fails (b)/(c) and passes through too — repair never corrupts. */
  private[graft] def fixMojibake(s: String): String = {
    var i = 0
    var marker = false
    while (i + 1 < s.length && !marker) {
      val c = s.charAt(i)
      // \u00C3 / \u00C2 / \u00E2 followed by a high-half char
      if ((c == '\u00C3' || c == '\u00C2' || c == '\u00E2') && s.charAt(i + 1) >= 0x80)
        marker = true
      i += 1
    }
    if (!marker) return s
    // byte-faithful Latin-1 re-encode: every char must be ≤ 0xFF
    var j = 0
    while (j < s.length) { if (s.charAt(j) > 0xFF) return s; j += 1 }
    val bytes = new Array[Byte](s.length)
    j = 0
    while (j < s.length) { bytes(j) = s.charAt(j).toByte; j += 1 }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => s }
  }

  /** Punctuation folding: the typographic characters a web corpus is
    * full of, mapped to their ASCII intent (smart quotes, en/em
    * dashes, ellipsis, NBSP). Applied AFTER NFKC (which does not fold
    * these — they are distinct characters, not compatibility forms). */
  private val punctFold: Map[Char, String] = Map(
    '\u2018' -> "'", '\u2019' -> "'", '\u201A' -> "'", '\u201B' -> "'",
    '\u201C' -> "\"", '\u201D' -> "\"", '\u201E' -> "\"",
    '\u2013' -> "-", '\u2014' -> "-", '\u2212' -> "-",
    '\u2026' -> "...", '\u00A0' -> " ",
    // LS/PS are line semantics, not noise: fold to newline
    '\u2028' -> "\n", '\u2029' -> "\n")

  /** Text normalization (round 13): the cleanup pass between ingestion
    * and every downstream operator — tokenizers, dedup shingles, and
    * quality heuristics all fracture on the same raw-web artifacts.
    * Order is load-bearing and documented:
    *  1. mojibake repair (exact round-trip, see [[fixMojibake]]);
    *  2. Unicode NFKC (the JDK normalizer — fullwidth forms, ligature
    *     decomposition, compatibility digits);
    *  3. punctuation folding (smart quotes → ASCII, dashes, ellipsis,
    *     NBSP → space — NFKC leaves these alone by design);
    *  4. control and zero-width characters dropped (keeping \n and
    *     \t), including BOM/ZWSP/ZWNJ/ZWJ and bidi marks.
    * Pure typed map stage; total on any input. */
  def normalizeText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val t0 = if (text == null) "" else text
        val t1 = fixMojibake(t0)
        val t2 = java.text.Normalizer.normalize(t1, java.text.Normalizer.Form.NFKC)
        val sb = new java.lang.StringBuilder(t2.length)
        var i = 0
        while (i < t2.length) {
          val c = t2.charAt(i)
          punctFold.get(c) match {
            case Some(rep) => sb.append(rep)
            case None =>
              // BOM, ZWSP..RLM (bidi marks), word joiner
              val drop = (Character.isISOControl(c) && c != '\n' && c != '\t') ||
                c == '\uFEFF' || (c >= '\u200B' && c <= '\u200F') || c == '\u2060'
              if (!drop) sb.append(c)
          }
          i += 1
        }
        (id, sb.toString)
      })
      .toDF(idCol, "text")
  }

  /** Repetition metrics (the word-level core of the Gopher quality rules,
    * Rae et al. 2021 §A1.1): excessive repetition is the strongest cheap
    * signal of machine-generated / boilerplate text. Per document:
    *
    *  - `n_tokens`        — whitespace token count;
    *  - `dup_token_frac`  — fraction of tokens that are repeats of an
    *                        earlier token: (n - distinct) / n;
    *  - `top{n}gram_frac` — for each n in `ns`: occurrences of the MOST
    *                        frequent word n-gram / total n-grams.
    *
    * Typed mapPartitions kernel (per-row scalar loops — same rationale as
    * [[Dedup.minhashSignature]]): one token split feeds all metrics; n-grams
    * are counted as strings in a reused HashMap, so results are exactly
    * reproducible by any engine that counts the same strings (no hash
    * collisions involved). Documents shorter than n tokens count a single
    * whole-text gram — the same convention as the shingle oracles. Ratios
    * divide exact integer counts: bit-stable across engines. Pure map
    * stage — at 100 TB this pipelines over the scan with zero shuffle. */
  def repetition(df: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(2, 3, 4)): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nsArr = ns.toArray
    val rows = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        // Integer, not Int: putIfAbsent's absent-key signal is a reference
        // null; with a primitive value type the null check only works via an
        // unspecified boxing quirk (scalac warns "always false").
        val counts = new java.util.HashMap[String, Integer]()
        val sb = new java.lang.StringBuilder
        it.map { case (id, text) =>
          // null text: zeroed metrics, never an executor NPE (the module's
          // no-NPE-mid-job posture; every ratio reads as "no repetition")
          if (text == null) (id, 0L, 0.0, nsArr.map(_ => 0.0))
          else {
          val toks = text.toLowerCase.split(" ", -1)
          val n = toks.length
          counts.clear()
          var i = 0
          var distinct = 0
          while (i < n) {
            if (counts.putIfAbsent(toks(i), 1) == null) distinct += 1
            i += 1
          }
          val dupFrac = (n - distinct).toDouble / n
          val fracs = nsArr.map { g =>
            val nGrams = math.max(n - g + 1, 1)
            counts.clear()
            var best = 0
            var j = 0
            while (j < nGrams) {
              sb.setLength(0)
              var t = 0
              while (t < g && j + t < n) {
                if (t > 0) sb.append(' ')
                sb.append(toks(j + t))
                t += 1
              }
              val k = sb.toString
              val c: Int = counts.merge(k, 1, (a, b) => Integer.valueOf(a + b))
              if (c > best) best = c
              j += 1
            }
            best.toDouble / nGrams
          }
          (id, n.toLong, dupFrac, fracs)
          }
        }
      }
      .toDF(idCol, "n_tokens", "dup_token_frac", "__fr")
    ns.zipWithIndex.foldLeft(rows) { case (d, (g, i)) =>
      d.withColumn(s"top${g}gram_frac", col("__fr")(i))
    }.drop("__fr")
  }

  /** The required-stopword list of the Gopher document filter (Rae et al.
    * 2021 §A1.1). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-level quality gates (Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", 2021
    * §A1.1), with the published thresholds as defaults. A document KEEPS
    * only if ALL hold:
    *
    *  - word count in [minWords, maxWords] ([50, 100k]);
    *  - mean word length in [minMeanLen, maxMeanLen] ([3, 10]);
    *  - '#' chars / words ≤ maxSymbolRatio and non-overlapping "..."
    *    occurrences / words ≤ maxSymbolRatio (0.1);
    *  - ≤ maxBulletFrac of lines start with a bullet (0.9) and
    *    ≤ maxEllipsisFrac of lines end with "..." (0.3);
    *  - ≥ minAlphaFrac of words contain an alphabetic character (0.8);
    *  - ≥ minStopHits distinct words from [[gopherStopwords]] (2).
    *
    * Complements [[repetition]] (the word-level half of the same filter
    * set). Typed kernel, pure map stage; words split on spaces/newlines
    * with empties dropped, lines trimmed of spaces — exact string
    * semantics the DuckDB oracle replays. Output: (id, n_words,
    * mean_word_len, hash_ratio, ellipsis_ratio, bullet_line_frac,
    * ellipsis_line_frac, alpha_word_frac, stop_hits, keep). */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2,
      // opt-in text passthrough: a filter→dedup pipeline keeps the text
      // flowing through ONE branch instead of re-reading the corpus for
      // a join-back on the kept ids (q_pipeline_corpus)
      withText: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val req = gopherStopwords.toArray
    val base = df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val lines = text.split("\n", -1)
        var nBullet = 0
        var nEllLine = 0
        var li = 0
        while (li < lines.length) {
          var s = 0
          var e = lines(li).length
          while (s < e && lines(li).charAt(s) == ' ') s += 1
          while (e > s && lines(li).charAt(e - 1) == ' ') e -= 1
          if (s < e && "•-*".indexOf(lines(li).charAt(s)) >= 0) nBullet += 1
          if (e - s >= 3 && lines(li).substring(e - 3, e) == "...") nEllLine += 1
          li += 1
        }
        val toks = text.split("[ \n]", -1).filter(_.nonEmpty)
        val nWords = toks.length
        var charSum = 0L
        var nAlpha = 0
        val seen = new java.util.HashSet[String]()
        var ti = 0
        while (ti < nWords) {
          val t = toks(ti)
          charSum += t.length
          var hasAlpha = false
          var ci = 0
          while (ci < t.length && !hasAlpha) {
            val c = t.charAt(ci)
            if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) hasAlpha = true
            ci += 1
          }
          if (hasAlpha) nAlpha += 1
          seen.add(t.toLowerCase)
          ti += 1
        }
        var stopHits = 0
        var ri = 0
        while (ri < req.length) { if (seen.contains(req(ri))) stopHits += 1; ri += 1 }
        var nHash = 0
        var ci = 0
        while (ci < text.length) { if (text.charAt(ci) == '#') nHash += 1; ci += 1 }
        // non-overlapping "..." count — replace()-semantics (leftmost first)
        var nEll = 0
        var p = text.indexOf("...")
        while (p >= 0) { nEll += 1; p = text.indexOf("...", p + 3) }
        val nw = math.max(nWords, 1)
        val nl = math.max(lines.length, 1)
        val meanLen = charSum.toDouble / nw
        val hashRatio = nHash.toDouble / nw
        val ellRatio = nEll.toDouble / nw
        val bulletFrac = nBullet.toDouble / nl
        val ellLineFrac = nEllLine.toDouble / nl
        val alphaFrac = nAlpha.toDouble / nw
        val keep = nWords >= minWords && nWords <= maxWords &&
          meanLen >= minMeanLen && meanLen <= maxMeanLen &&
          hashRatio <= maxSymbolRatio && ellRatio <= maxSymbolRatio &&
          bulletFrac <= maxBulletFrac && ellLineFrac <= maxEllipsisFrac &&
          alphaFrac >= minAlphaFrac && stopHits >= minStopHits
        (id, text, nWords.toLong, meanLen, hashRatio, ellRatio, bulletFrac,
          ellLineFrac, alphaFrac, stopHits.toLong, keep)
      })
      .toDF(idCol, textCol, "n_words", "mean_word_len", "hash_ratio", "ellipsis_ratio",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac", "stop_hits", "keep")
    if (withText) base else base.drop(textCol)
  }

  /** C4-style cleaning (Raffel et al., "Exploring the Limits of Transfer
    * Learning with a Unified Text-to-Text Transformer", 2020 §2.2 — the
    * public C4 heuristics). Line rules — a line survives only if it
    * (a) ends in terminal punctuation ('.', '!', '?', or '"'),
    * (b) has ≥ `minWordsPerLine` space-separated words, and
    * (c) does not contain "javascript" (case-insensitive).
    * Document rules — `keep` is true only if the CLEANED text counts
    * ≥ `minSentences` terminal-punctuation marks and the RAW text contains
    * neither "lorem ipsum" (case-insensitive) nor '{'.
    *
    * Typed mapPartitions kernel (per-line scalar loops, same rationale as
    * [[repetition]]); string semantics chosen to be exactly replayable in
    * SQL: lines split on '\n', trimmed of SPACES only (matching SQL
    * `trim`), words split on single spaces with empties dropped. Pure map
    * stage — pipelines over the scan with zero shuffle at any size.
    * Output: (id, text_clean, n_lines_kept, n_lines_total, n_sentences,
    * keep). */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
      minWordsPerLine: Int = 3, minSentences: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val lines = text.split("\n", -1)
        val kept = new scala.collection.mutable.ArrayBuffer[String](lines.length)
        var i = 0
        while (i < lines.length) {
          var s = 0
          var e = lines(i).length
          while (s < e && lines(i).charAt(s) == ' ') s += 1
          while (e > s && lines(i).charAt(e - 1) == ' ') e -= 1
          val t = lines(i).substring(s, e)
          val endsOk = t.nonEmpty && ".!?\"".indexOf(t.charAt(t.length - 1)) >= 0
          if (endsOk && t.split(" ", -1).count(_.nonEmpty) >= minWordsPerLine &&
              !t.toLowerCase.contains("javascript"))
            kept += t
          i += 1
        }
        val clean = kept.mkString("\n")
        var nSent = 0L
        var c = 0
        while (c < clean.length) {
          val ch = clean.charAt(c)
          if (ch == '.' || ch == '!' || ch == '?') nSent += 1
          c += 1
        }
        val keep = nSent >= minSentences &&
          !text.toLowerCase.contains("lorem ipsum") && !text.contains("{")
        (id, clean, kept.length.toLong, lines.length.toLong, nSent, keep)
      })
      .toDF(idCol, "text_clean", "n_lines_kept", "n_lines_total", "n_sentences", "keep")
  }

  /** Line-level repetition metrics — the remaining half of the Gopher
    * repetition rules (Rae et al. 2021 §A1.1, "duplicate line fraction" /
    * "duplicate line character fraction"; [[repetition]] covers the
    * word-level half):
    *
    *  - `n_lines`             — '\n'-split line count;
    *  - `dup_line_frac`       — occurrences beyond the first of an
    *                            identical line / total lines;
    *  - `dup_line_char_frac`  — characters in those duplicate occurrences
    *                            / characters across all lines.
    *
    * Lines compared VERBATIM (no trim/case-fold — the published rule).
    * Typed kernel, pure map stage, exact integer ratios. */
  def repetitionLines(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val counts = new java.util.HashMap[String, Int]()
        it.map { case (id, text) =>
          if (text == null) (id, 0L, 0.0, 0.0)
          else {
          val lines = text.split("\n", -1)
          counts.clear()
          var dupLines = 0L
          var dupChars = 0L
          var allChars = 0L
          var i = 0
          while (i < lines.length) {
            val l = lines(i)
            allChars += l.length
            if (counts.merge(l, 1, (a, b) => a + b) > 1) {
              dupLines += 1
              dupChars += l.length
            }
            i += 1
          }
          (id, lines.length.toLong,
            dupLines.toDouble / lines.length,
            if (allChars == 0) 0.0 else dupChars.toDouble / allChars)
          }
        }
      }
      .toDF(idCol, "n_lines", "dup_line_frac", "dup_line_char_frac")
  }

  /** PII detection + redaction: emails, IPv4 addresses, and international-
    * format phone numbers, counted on the raw text and replaced with typed
    * placeholders. The patterns are the portable ASCII core (valid in both
    * java.util.regex and RE2, leftmost-greedy in both — no alternation
    * whose tie-break differs): a production pipeline swaps in its
    * compliance-grade pattern set without changing the plan, which is the
    * point — a codegen'd map stage over the scan, no shuffle, no UDF. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phoneRe = "\\+[0-9][0-9 ()-]{6,}[0-9]"

  def redactPii(df: DataFrame, textCol: String, as: String = "redacted"): DataFrame =
    // Column-form regexp_extract_all: the pattern goes in as a literal, not
    // through the SQL parser's string-escape pass (which would strip \b, \+)
    df
      .withColumn("n_emails", size(regexp_extract_all(col(textCol), lit(emailRe), lit(0))).cast("long"))
      .withColumn("n_ipv4", size(regexp_extract_all(col(textCol), lit(ipv4Re), lit(0))).cast("long"))
      .withColumn("n_phones", size(regexp_extract_all(col(textCol), lit(phoneRe), lit(0))).cast("long"))
      .withColumn(as,
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), emailRe, "<EMAIL>"),
            ipv4Re, "<IP>"),
          phoneRe, "<PHONE>"))

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

  /** Compression-ratio quality signal — the RefinedWeb / Gopher-family
    * "too compressible = boilerplate, too incompressible = gibberish"
    * heuristic (highly repetitive spam compresses far below prose;
    * random/encrypted junk refuses to compress at all). Ratio =
    * compressed/raw bytes of the UTF-8 text through the zstd level-3
    * kernel the serde layer already ships ([[graft.functions.Helpers]]).
    *
    * zstd output bytes are deterministic for a fixed (input, level,
    * library build) — reruns and retried tasks agree — but no SQL engine
    * replays a compressor, so this operator's evidence is ScalaTest (ratio
    * ordering on crafted prose/repetition/noise + determinism), not a
    * DuckDB row compare: the one op where an oracle would have to be the
    * implementation. Pure map stage; NULL text → NULL ratio.
    * Output: (idCol, raw_bytes, zstd_bytes, compression_ratio). */
  def compressionRatio(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        if (text == null) (id, None: Option[Long], None: Option[Long], None: Option[Double])
        else {
          val raw = text.getBytes("UTF-8")
          val comp = graft.functions.Helpers.zstdCompress(raw, 3)
          val ratio =
            if (raw.length == 0) None else Some(comp.length.toDouble / raw.length)
          (id, Some(raw.length.toLong), Some(comp.length.toLong), ratio)
        }
      })
      .toDF(idCol, "raw_bytes", "zstd_bytes", "compression_ratio")
  }

  /** Invariant audit of the zstd roundtrip — the oracle-able face of
    * [[compressionRatio]]. No SQL engine replays a compressor, but a SQL
    * engine CAN recompute everything AROUND one: per doc this emits the
    * original UTF-8 length and SHA-256 plus the length and SHA-256 of
    * `decompress(compress(text))` — all four recomputable by DuckDB from
    * the corpus alone (`octet_length`, `sha256`), so the row compare
    * asserts the roundtrip is lossless — and `bound_ok`, the compressor's
    * own worst-case size contract (`Zstd.compressBound`), which the
    * oracle pins to TRUE. A broken codec, a truncated frame, or a
    * corrupted buffer shows up as a sha/length/boolean mismatch in the
    * gate rather than only in ScalaTest. Runs the SAME serde kernels
    * ([[graft.functions.Helpers.zstdCompress]]/`zstdDecompress`) the
    * checkpoint/stream payloads use (reference helpers.py:408-413).
    * Pure map stage — one pass, no shuffle; NULL text rows are dropped
    * (mirrored by the oracle's `WHERE text IS NOT NULL`). */
  def compressionAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def sha256Hex(b: Array[Byte]): String = {
      val d = java.security.MessageDigest.getInstance("SHA-256").digest(b)
      d.map("%02x".format(_)).mkString
    }
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .filter(col(textCol).isNotNull)
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val raw = text.getBytes("UTF-8")
        val comp = graft.functions.Helpers.zstdCompress(raw, 3)
        val back = graft.functions.Helpers.zstdDecompress(comp)
        val boundOk =
          comp.length.toLong <= com.github.luben.zstd.Zstd.compressBound(raw.length.toLong)
        (id, raw.length.toLong, sha256Hex(raw), back.length.toLong, sha256Hex(back), boundOk)
      })
      .toDF(idCol, "original_len", "original_sha2", "decompressed_len",
        "decompressed_sha2", "bound_ok")
  }

  /** CCNet perplexity bucketing (Wenzek et al. 2020 §4.3): split the corpus
    * into `nBuckets` equal-count tiers (head/middle/tail for 3) of the
    * [[lmScore]] surprisal distribution — CCNet keeps "head", samples
    * "middle", drops "tail". Bucket key = `surprisal_micronats div n_terms`
    * (integer mean micro-nats — exact, order-free); thresholds are true
    * order statistics: t_i = the smallest key whose cumulative count
    * reaches ⌈i·N/nBuckets⌉, and `bucket` = #{t_i < key} (ties never split
    * a bucket boundary). Docs with < 2 tokens (unscorable) get NULL.
    *
    * Scale shape: scoring is [[lmScore]]'s broadcast-model map stage; the
    * threshold pass aggregates a (key → count) histogram — map-side
    * combined, bounded by DISTINCT mean values — and only the histogram's
    * running sum uses an unpartitioned window. At 100 TB pre-bin the key
    * (`div B`) to cap the histogram's cardinality; the bucket assignment
    * itself stays a pure map against the nBuckets-1 broadcast thresholds. */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String, nBuckets: Int = 3,
      scorer: (DataFrame, String, String, DataFrame, String) => DataFrame = lmScore): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val scored = scorer(df, idCol, textCol, reference, refTextCol)
    val keyed = scored.withColumn("mean_micronats",
      when(col("n_terms") > 0, expr("surprisal_micronats div n_terms")))
    // the histogram is tiny (≤ distinct mean keys) and feeds BOTH scalar
    // jobs — persist it so the corpus-wide scoring scan runs once for the
    // thresholds (plus once for the final output), not once per action;
    // nTotal is its count sum, not a third pass over keyed
    val hist = keyed.filter(col("mean_micronats").isNotNull)
      .groupBy("mean_micronats").agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cum = hist.withColumn("__cum",
      sum("__c").over(org.apache.spark.sql.expressions.Window.orderBy("mean_micronats")))
    val nTotalRow = hist.agg(sum("__c")).head()
    val nTotal = if (nTotalRow.isNullAt(0)) 0L else nTotalRow.getLong(0)
    val targets = (1 until nBuckets).map(i => (i.toLong * nTotal + nBuckets - 1) / nBuckets)
    val cutAggs = targets.zipWithIndex.map { case (t, j) =>
      min(when(col("__cum") >= t, col("mean_micronats"))).as(s"__t$j")
    }
    // no scorable docs: every bucket is NULL anyway, skip the cut job
    val cuts =
      if (nTotal == 0) targets.indices.map(_ => Long.MaxValue)
      else {
        val cutRow = cum.agg(cutAggs.head, cutAggs.tail: _*).head()
        targets.indices.map(cutRow.getLong)
      }
    hist.unpersist(blocking = false)
    val bucket = cuts.map(c => when(col("mean_micronats") > c, 1).otherwise(0))
      .reduce(_ + _)
    keyed.withColumn("bucket",
      when(col("mean_micronats").isNotNull, bucket).cast("int"))
      .select(col(idCol), col("n_terms"), col("surprisal_micronats"),
        col("mean_micronats"), col("bucket"))
  }

  /** Slim postings table (__id, term, tf) — the shared discovery input of
    * the BM25 family (r15 optimization). Sharing works by passing the ONE
    * returned DataFrame OBJECT to every consumer inside one composed plan:
    * Dataset.flatMap wraps the user lambda in a fresh capturing adaptor per
    * call, so two textually identical calls do NOT canonicalize equal and
    * exchange reuse can never dedupe them — only the shared object does
    * (its subtrees are trivially sameResult, so the tf aggregation's
    * exchange materializes once and every other consumer gets a
    * ReusedExchange). [[bm25PrfTopK]] is the composition built on this.
    * Deliberately NOT persisted: the columnar cache's build +
    * row-at-a-time string decompression cost more than exchange reuse
    * (measured: q_text_bm25 1.4 → 1.7 s with persist). */
  private def termFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null) Iterator.empty
        else text.toLowerCase.split(" ", -1).iterator.map(t => (id, t))
      }
      .toDF("__id", "term")
      .groupBy("__id", "term").agg(count(lit(1)).as("tf"))
  }

  /** The two plan literals of the BM25 arithmetic, in ONE eager pass over
    * the corpus scan: N = all docs (null text included), TL = total tokens
    * (null text contributes none — matching the tokenizer's flatMap). */
  private def corpusScalars(df: DataFrame, textCol: String): (Long, Long) = {
    val scal = df.agg(count(lit(1)),
      sum(when(col(textCol).isNull, 0)
        .otherwise(size(split(col(textCol), " ", -1))))).head()
    (scal.getLong(0), if (scal.isNullAt(1)) 0L else scal.getLong(1))
  }

  /** Query tokenization to the (q_id, term) shape — one definition shared
    * by [[bm25TopK]] and the PRF family so originals are identical rows. */
  private def queryTermRows(queries: DataFrame, qIdCol: String,
      qTextCol: String): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    queries
      .select(col(qIdCol).cast("long").as("q_id"), col(qTextCol).as("__qt"))
      .as[(Long, String)]
      .flatMap { case (q, text) =>
        if (text == null) Iterator.empty
        else text.toLowerCase.split(" ", -1).distinct.iterator.map(t => (q, t))
      }
      .toDF("q_id", "term")
  }

  /** BM25 top-k retrieval (Robertson & Zaragoza 2009; Lucene's idf variant)
    * — the ranked form of [[tfidfTopTerms]]'s statistics: for each query,
    * the k best documents under
    * `score(q,d) = Σ_{t∈q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * with k1 = 1.2, b = 0.75. Inside a curation pipeline this is how a
    * small trusted seed set pulls its nearest corpus documents (quality
    * mining), the sparse complement of the embedding ANN family.
    *
    * Determinism contract: idf = ⌊ln((2N+2)/(2·df+1))·10⁶ + 0.5⌋ (Lucene's
    * 1+… form — always positive — collapsed to one integer ratio; the one
    * double log, [[lmScore]]'s replay posture), and the saturation fraction
    * is cleared of avgdl's division: with k1 = 6/5, b = 3/4,
    * `tf·(k1+1)/(tf + k1(1−b) + k1·b·dl·N/TL) = 22·tf·TL / (10·TL·tf +
    * 3·TL + 9·dl·N)` — exact integers in both engines (TL = total tokens,
    * N = docs; Long-safe to ~10¹⁴ token-corpora, past which the pure-double
    * form is the production path). Each term's contribution is FLOORED to
    * an integer micro-nat (floor(idf*frac + 0.5)), so the per-(q,d) score
    * is an order-free integer SUM — a codegen'd hash aggregate. (The first
    * cut summed raw doubles through sort_array + an `aggregate` lambda for
    * bit-stable ordering: correct, but the interpreted per-group fold
    * measured 58 s vs ~2 s at sf0.1 — the winnowing-HOF lesson again.
    * Quantizing each term makes summation order irrelevant and keeps the
    * whole pipeline in Tungsten.)
    *
    * Scale shape: tf/dl/df are the slim aggregations a 100 TB inverted
    * index is built from (term-keyed, map-side combined); the query term
    * join broadcasts (queries are small by retrieval's premise); ranking is
    * the bounded top-k Aggregator ([[Ann.topKPerQuery]]) — no per-q_id
    * window. `maxDf` (None = exact) skips terms whose posting lists exceed
    * it — static WAND-style pruning: a term in half the corpus carries
    * near-zero idf yet pairs every query with half the corpus, so real
    * retrieval deployments cap it.
    * Output: (q_id, doc_id, score_micronats, rank <= k). */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      topK: Int = 10, maxDf: Option[Long] = None): DataFrame =
    bm25TopKTerms(df, idCol, textCol,
      queryTermRows(queries, qIdCol, qTextCol), topK, maxDf)

  /** [[bm25TopK]] with the queries ALREADY tokenized to a (q_id, term)
    * table — the seam query-EXPANSION operators feed ([[prfExpandTerms]]
    * unions feedback terms into exactly this shape). Duplicate (q, term)
    * rows are collapsed, matching the text form's `distinct`. */
  def bm25TopKTerms(df: DataFrame, idCol: String, textCol: String,
      queryTerms: DataFrame, topK: Int = 10, maxDf: Option[Long] = None): DataFrame = {
    val (n, tl) = corpusScalars(df, textCol)
    bm25ScoredOn(termFrequencies(df, idCol, textCol), n, tl, queryTerms, topK, maxDf)
  }

  /** The scoring core over a SHARED postings frame — every BM25-family
    * entry point funnels here so a composed pipeline ([[bm25PrfTopK]])
    * passes one `tf` object and the tokenize+aggregate subtree runs once
    * (ReusedExchange), instead of once per pass. */
  private def bm25ScoredOn(tf: DataFrame, n: Long, tl: Long,
      queryTerms: DataFrame, topK: Int, maxDf: Option[Long]): DataFrame = {
    // dl derives from tf (dl = Σ tf per doc) — same values as counting the
    // token stream directly, but over the shared postings subtree
    val dl = tf.groupBy("__id").agg(sum("tf").as("dl"))
    val dfcAll = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dfc = maxDf.map(m => dfcAll.filter(col("df") <= m)).getOrElse(dfcAll)
    val qt = queryTerms
      .select(col("q_id").cast("long"), col("term")).distinct()
    // BM25 is a sparse matrix product: scores(q, d) = Σ_t Q(q,t)·V(t,d).
    // V's term score depends only on (term, doc), so it is computed on the
    // SLIM postings table (|docs|·|distinct terms per doc| rows) BEFORE
    // the query join multiplies rows by |matching queries| — the exploded
    // rows carry just (q_id, doc, v), and the only post-explosion exchange
    // is the score aggregation itself. The df side broadcasts (vocab-
    // bounded; `maxDf` keeps it and the explosion in check on real
    // corpora): joining it by shuffle instead would repartition the
    // postings by term — a |vocab|-key hot-partition shape.
    val v = tf.join(dl, Seq("__id")).join(broadcast(dfc), Seq("term"))
      .withColumn("__idf",
        floor(log((lit(2.0) * n + lit(2.0)) / (lit(2.0) * col("df") + lit(1.0)))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("__v",
        floor(col("__idf").cast("double") * (lit(22.0) * col("tf") * lit(tl.toDouble)) /
          (lit(10.0) * lit(tl.toDouble) * col("tf") + lit(3.0) * lit(tl.toDouble)
            + lit(9.0) * col("dl") * lit(n.toDouble)) + lit(0.5)).cast("long"))
      .select(col("term"), col("__id"), col("__v"))
    val sums = v.join(broadcast(qt), Seq("term"))
      .groupBy("q_id", "__id").agg(sum("__v").as("score_micronats"))
    Ann.topKPerQuery(
        sums.select(col("q_id"), col("__id").as("nn_id"),
          col("score_micronats").cast("double").as("cosine")),
        topK)
      .select(col("q_id"), col("nn_id").as("doc_id"),
        col("cosine").cast("long").as("score_micronats"), col("rank").cast("long").as("rank"))
  }

  /** Pseudo-relevance-feedback query expansion (the Rocchio/RM3 family):
    * run a first BM25 pass, treat each query's top `fbDocs` documents as
    * relevant, score every term they contain by Σ_docs tf · idfµ (the
    * same integer micro-nat idf BM25 uses), and return the original query
    * terms UNIONED with each query's top `fbTerms` NEW terms (originals
    * are excluded from the feedback ranking; ties break by term). Feed
    * the output to [[bm25TopKTerms]] for the expanded second pass.
    *
    * Scale shape: the feedback candidate set is `fbDocs` documents' worth
    * of postings per query — the per-query ranking window rides a small
    * list BY CONSTRUCTION (feedback depth is a constant, never the
    * corpus); idf joins broadcast exactly as in the scoring pass.
    * Output: (q_id, term). */
  def prfExpandTerms(df: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      fbDocs: Int = 5, fbTerms: Int = 5, maxDf: Option[Long] = None): DataFrame = {
    val (n, tl) = corpusScalars(df, textCol)
    prfTermsOn(termFrequencies(df, idCol, textCol), n, tl,
      queryTermRows(queries, qIdCol, qTextCol), fbDocs, fbTerms, maxDf)
  }

  /** The PRF expansion core over a SHARED postings frame (see
    * [[bm25ScoredOn]] for why sharing must be by object). The first pass is
    * the scoring core itself, so inside one composed plan the corpus
    * subtree appears once. */
  private def prfTermsOn(tf: DataFrame, n: Long, tl: Long, originals: DataFrame,
      fbDocs: Int, fbTerms: Int, maxDf: Option[Long]): DataFrame = {
    require(fbDocs >= 1 && fbTerms >= 0, "prf: fbDocs >= 1, fbTerms >= 0")
    val first = bm25ScoredOn(tf, n, tl, originals, fbDocs, maxDf)
      .select(col("q_id"), col("doc_id").as("__id"))
    val dfcAll = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dfc = maxDf.map(m => dfcAll.filter(col("df") <= m)).getOrElse(dfcAll)
    val fb = tf.join(first, Seq("__id"))
      .join(broadcast(dfc), Seq("term"))
      .join(originals, Seq("q_id", "term"), "left_anti")
      .withColumn("__idf",
        floor(log((lit(2.0) * n + lit(2.0)) / (lit(2.0) * col("df") + lit(1.0)))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy("q_id", "term").agg(sum(col("tf") * col("__idf")).as("__fb"))
    val picked = fb
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("__fb").desc, col("term"))))
      .filter(col("__r") <= fbTerms)
      .select("q_id", "term")
    originals.unionByName(picked).distinct()
  }

  /** PRF-expanded BM25 in ONE composed plan (r15 optimization): expansion
    * ([[prfExpandTerms]]) and the expanded second pass ([[bm25TopKTerms]])
    * over a SINGLE shared postings frame and a SINGLE eager scalar pass.
    * Row-identical to the two-call composition by construction (the cores
    * are the same code; LlmSpec pins it) — the two-call form pays the
    * corpus tokenize+aggregate three times and the scalar scan twice,
    * because separately built Dataset.flatMap plans cannot canonicalize
    * equal (capturing adaptor lambdas), so exchange reuse only fires
    * within this shared-object composition. */
  def bm25PrfTopK(df: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      topK: Int = 10, fbDocs: Int = 5, fbTerms: Int = 5,
      maxDf: Option[Long] = None): DataFrame = {
    val tf = termFrequencies(df, idCol, textCol)
    val (n, tl) = corpusScalars(df, textCol)
    val originals = queryTermRows(queries, qIdCol, qTextCol)
    val expanded = prfTermsOn(tf, n, tl, originals, fbDocs, fbTerms, maxDf)
    bm25ScoredOn(tf, n, tl, expanded, topK, maxDf)
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
