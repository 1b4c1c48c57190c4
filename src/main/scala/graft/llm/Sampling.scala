package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic dataset splitting and sampling for training-data
  * pipelines. The reference has no split primitive (its pipelines stop at
  * consume/produce); a 100 TB training corpus needs reproducible
  * train/val/test routing that is stable across reruns, partitionings, and
  * cluster sizes — so every decision here is a pure function of the row's
  * OWN id through splitmix64, never `rand()` (a nondeterministic expression
  * feeding a shuffle key silently corrupts retried stages — SPARK-23207
  * class) and never row position.
  *
  * The hash runs in a typed mapPartitions kernel: splitmix64's multiplies
  * WRAP in two's-complement, which ANSI-mode Column arithmetic (Spark 4
  * default) rejects as overflow — JVM Long arithmetic inside a kernel is
  * the honest wrap. The routing itself stays a codegen'd when-chain.
  * Bucket arithmetic is replicated exactly in DuckDB by the oracle
  * (HashOracle.sm64), so splits are verified bit-for-bit, not
  * statistically.
  */
object Sampling {

  /** Append `__bucket` ∈ [0, 10000) = pmod(splitmix64(id), 10000). The id
    * is hashed through a TEMP long column (try_cast — ANSI cast would throw
    * on a malformed string id) so the caller's id column passes through
    * untouched; a null or non-castable id gets a NULL bucket, which every
    * downstream comparison treats deterministically (hashSplit routes it to
    * the last split via `otherwise`, hashSample drops it). */
  private def withBucket(df: DataFrame, idCol: String): DataFrame = {
    val in = df.withColumn("__id_long", expr(s"try_cast(`$idCol` as bigint)"))
    val idIdx = in.schema.fieldIndex("__id_long")
    val outSchema = in.schema.add("__bucket", LongType, nullable = true)
    in.mapPartitions { rows =>
      rows.map { row =>
        val bucket =
          if (row.isNullAt(idIdx)) null
          else {
            val h = Hashing.splitmix64(row.getLong(idIdx))
            ((h % 10000) + 10000) % 10000
          }
        Row.fromSeq(row.toSeq :+ bucket)
      }
    }(Encoders.row(outSchema)).drop("__id_long")
  }

  /** Route each row to a named split by hash bucket. `fracs` are
    * (name, fraction) in priority order; fractions are taken to the NEAREST
    * multiple of 1/10000 (`math.round`, not truncation — 0.0003 * 10000 is
    * 2.9999999999999996 in binary double, and truncating it would silently
    * shrink the split by a bucket) and must sum to ≤ 1; the remainder —
    * including rows whose id is null or not castable to long — falls into
    * the LAST split. Example: Seq(("train", 0.98), ("val", 0.01), ("test",
    * 0.01)). Adding rows later never re-routes existing ones. */
  def hashSplit(df: DataFrame, idCol: String, fracs: Seq[(String, Double)],
      as: String = "split"): DataFrame = {
    require(fracs.nonEmpty, "at least one split")
    require(fracs.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val cuts = fracs.map(_._2 * 10000).map(math.round)
    val uppers = cuts.scanLeft(0L)(_ + _).tail // cumulative upper bounds
    val b = col("__bucket")
    // first when in the chain wins: bucket < upper_i routes to split i
    val expr = fracs.map(_._1).zip(uppers).foldLeft(when(lit(false), lit(""))) {
      case (acc, (name, hi)) => acc.when(b < lit(hi), lit(name))
    }.otherwise(lit(fracs.last._1))
    withBucket(df, idCol).withColumn(as, expr).drop("__bucket")
  }

  /** Deterministic fraction sample: keep rows whose bucket falls under
    * `frac` (nearest 1/10000 unit) — the reproducible form of
    * `df.sample(frac)` for pipeline reruns. Rows with a null/non-castable
    * id have a NULL bucket and are dropped (the filter is never true). */
  def hashSample(df: DataFrame, idCol: String, frac: Double): DataFrame =
    withBucket(df, idCol)
      .filter(col("__bucket") < lit(math.round(frac * 10000)))
      .drop("__bucket")

  /** Weighted (probability-proportional-to-size) fixed-size sample —
    * sequential Poisson sampling (Ohlsson 1998; the order-sampling family
    * summarized in Rosén 1997): draw u_i uniform, rank items by u_i / w_i
    * ascending, keep the k smallest. High-weight items get small ranks and
    * are selected with probability ≈ proportional to w_i — the "keep more
    * of the high-quality documents, but not ONLY the top scorers"
    * selection a quality-weighted corpus cut needs, where a deterministic
    * top-k BY WEIGHT would take a biased slice of one domain. Relation to
    * [[dsirSelect]]: same order-sampling family, different regime —
    * Gumbel-top-k draws ∝ exp(log-weight) and rides DSIR's micro-nat log
    * pipeline; this one draws ∝ the LINEAR weight directly (bytes, token
    * counts, quality scores) with no log transform and no floating point
    * anywhere.
    *
    * Determinism, this repo's way: u_i is not a RNG draw but
    * splitmix64(id) — the rank key is a pure function of the row, stable
    * across reruns/retries/partitionings. The comparison runs in exact
    * integer arithmetic: u = (splitmix64(id) >>> 3) + 1 ∈ [1, 2⁶¹] and
    * priority = u div max(w, 1) — a 2⁶¹-resolution floor of u/w (identical
    * in JVM `/` and DuckDB `//` for positives; ≥2⁴⁰ distinct values at any
    * realistic weight scale, ties broken by id). The hash runs in the same
    * mapPartitions kernel posture as [[withBucket]] (ANSI Column arithmetic
    * rejects the wrap). Null/non-castable ids or weights drop (a sample
    * must not contain rows it cannot re-derive).
    *
    * Scale shape: map kernel → `orderBy(priority, id).limit(k)`, which
    * Spark plans as TakeOrderedAndProject — per-partition bounded top-k
    * heaps merged once, k-bounded everywhere, NEVER a global sort. Output:
    * the id, weight, and `priority` columns. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val in = df.select(
      expr(s"try_cast(`$idCol` as bigint)").as("__id_long"),
      expr(s"try_cast(`$weightCol` as bigint)").as("__w_long"))
    val outSchema = in.schema.add("__prio", LongType, nullable = true)
    val keyed = in.mapPartitions { rows =>
      rows.map { row =>
        val prio =
          if (row.isNullAt(0) || row.isNullAt(1)) null
          else {
            val u = (graft.llm.Hashing.splitmix64(row.getLong(0)) >>> 3) + 1L
            Long.box(u / math.max(row.getLong(1), 1L))
          }
        Row.fromSeq(row.toSeq :+ prio)
      }
    }(Encoders.row(outSchema))
    keyed.filter(col("__prio").isNotNull)
      .orderBy("__prio", "__id_long")
      .limit(k)
      .select(col("__id_long").as(idCol), col("__w_long").as(weightCol),
        col("__prio").as("priority"))
  }

  /** Temperature-scaled stratum rebalancing — the XLM-R / mT5 move
    * (Conneau et al. 2020 §3.1): sample stratum l proportionally to
    * p_l^alpha, flattening a skewed language (or source) distribution
    * without upsampling. Derivation: the target shares q_l ∝ p_l^alpha are
    * reached by keeping stratum l with probability ∝ p_l^(alpha-1),
    * normalized so the largest keep fraction is exactly 1 (the most
    * down-weighted-toward-equality stratum keeps everything; with
    * alpha < 1 that is the SMALLEST stratum). Membership is the same
    * deterministic splitmix64 bucket-vs-cut comparison as [[hashSample]]:
    * cut_l = floor((c_l^(alpha-1) / max_m c_m^(alpha-1)) · 10000 + 0.5).
    *
    * Scale shape: ONE map-side-combined count per stratum (|strata|-
    * bounded collect — languages/sources number in the hundreds), cuts
    * computed on the driver, then a codegen'd when-chain filter — a pure
    * map stage over the scan, identical to [[hashSampleStratified]].
    * alpha = 1 keeps everything; alpha → 0 approaches equal shares. */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    // a null stratum is a real stratum (capPerDomain's posture): counted
    // under a sentinel driver key and matched back with isNull — without
    // this, collect() hands sortBy a null key (driver NPE) and === lit
    // silently drops every null-stratum row
    val counts = df.groupBy(col(stratumCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__c"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1)))
    // zero rows → zero strata → nothing to rebalance; short-circuit before
    // the max (empty.max throws) — the result is df itself, already empty
    if (counts.isEmpty) return df
    val ratios = counts.map { case (s, c) => (s, math.pow(c.toDouble, alpha - 1.0)) }
    val rmax = ratios.map(_._2).max
    val cuts = ratios.map { case (s, r) =>
      (s, math.floor(r / rmax * 10000.0 + 0.5).toLong)
    }
    val cut = cuts.sortBy(_._1).foldLeft(when(lit(false), lit(0L))) {
      case (acc, (Some(value), c)) => acc.when(col(stratumCol) === lit(value), lit(c))
      case (acc, (None, c)) => acc.when(col(stratumCol).isNull, lit(c))
    }.otherwise(lit(0L)) // unseen stratum (only possible vs a changed input): drop
    withBucket(df, idCol).filter(col("__bucket") < cut).drop("__bucket")
  }

  /** Bounded min-k as a typed Aggregator: the buffer holds AT MOST k
    * (h, id) pairs in ascending (h signed, id) order — the same total order
    * a `row_number() OVER (ORDER BY h, id)` window ranks by, so the two
    * agree exactly. Partial aggregation bounds each map task's state to k
    * per local domain and the exchange to ≤ k rows per (partition, domain):
    * parallelism is never |domains|-bounded and a hot domain's candidates
    * are never materialized in one place (the [[graft.llm.Ann.TopKAgg]]
    * pattern, flipped to ascending). */
  private class MinKAgg(k: Int) extends org.apache.spark.sql.expressions.Aggregator[
      (String, Long, Long), List[(Long, Long)], Seq[(Long, Long)]] {
    private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
    private def insert(buf: List[(Long, Long)], e: (Long, Long)): List[(Long, Long)] = {
      val (pre, post) = buf.span(lt(_, e))
      val merged = pre ::: e :: post
      if (merged.length > k) merged.take(k) else merged
    }
    def zero: List[(Long, Long)] = Nil
    def reduce(buf: List[(Long, Long)], a: (String, Long, Long)): List[(Long, Long)] =
      insert(buf, (a._2, a._3))
    def merge(x: List[(Long, Long)], y: List[(Long, Long)]): List[(Long, Long)] =
      y.foldLeft(x)(insert)
    def finish(buf: List[(Long, Long)]): Seq[(Long, Long)] = buf
    def bufferEncoder: org.apache.spark.sql.Encoder[List[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Long)]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Bounded budget-prefix as a typed Aggregator — [[MinKAgg]] with the
    * truncation rule changed from "k elements" to "the minimal ascending
    * (h, id) prefix whose token sum covers the budget". A row is kept iff
    * the tokens BEFORE it (in that total order) are < budget, so the
    * buffer never needs more than the crossing element: state per
    * (task, domain) is ≤ budget/min_tokens + 1 entries (token counts are
    * clamped ≥ 1 so empty docs can't make the prefix unbounded). Merge =
    * sorted-merge then re-truncate, associative and commutative like any
    * mergeable top-k. */
  private class BudgetAgg(budget: Long) extends org.apache.spark.sql.expressions.Aggregator[
      (String, Long, Long, Long), List[(Long, Long, Long)], Seq[(Long, Long, Long)]] {
    private def lt(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
    private def truncate(l: List[(Long, Long, Long)]): List[(Long, Long, Long)] = {
      var sum = 0L
      val out = List.newBuilder[(Long, Long, Long)]
      val it = l.iterator
      var open = true
      while (open && it.hasNext) {
        val e = it.next()
        if (sum < budget) { out += e; sum += math.max(e._3, 1L) } else open = false
      }
      out.result()
    }
    private def insert(buf: List[(Long, Long, Long)], e: (Long, Long, Long)): List[(Long, Long, Long)] = {
      val (pre, post) = buf.span(lt(_, e))
      truncate(pre ::: e :: post)
    }
    def zero: List[(Long, Long, Long)] = Nil
    def reduce(buf: List[(Long, Long, Long)], a: (String, Long, Long, Long)): List[(Long, Long, Long)] =
      insert(buf, (a._2, a._3, a._4))
    def merge(x: List[(Long, Long, Long)], y: List[(Long, Long, Long)]): List[(Long, Long, Long)] = {
      @annotation.tailrec
      def go(a: List[(Long, Long, Long)], b: List[(Long, Long, Long)],
          acc: List[(Long, Long, Long)]): List[(Long, Long, Long)] = (a, b) match {
        case (Nil, r) => acc.reverse ::: r
        case (l, Nil) => acc.reverse ::: l
        case (ah :: at, bh :: bt) =>
          if (lt(ah, bh)) go(at, b, ah :: acc) else go(a, bt, bh :: acc)
      }
      truncate(go(x, y, Nil))
    }
    def finish(buf: List[(Long, Long, Long)]): Seq[(Long, Long, Long)] = buf
    def bufferEncoder: org.apache.spark.sql.Encoder[List[(Long, Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Long, Long)]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long)]]()
  }

  /** Token-budgeted per-domain admission — corpus assembly against a
    * TOKEN target, not a document count (mixture recipes are specified in
    * tokens): admit each domain's documents in the deterministic
    * (splitmix64(id), id) order until the domain's summed token count
    * reaches `budget`; the document that crosses the budget is admitted
    * and closes the domain. Appends `tokens_before` (the domain's admitted
    * token sum preceding the row — < budget for every kept row by
    * definition). Token counts are clamped ≥ 1 (an empty doc still costs
    * one slot, else unbounded zero-cost admission).
    *
    * Scale shape mirrors [[capPerDomain]]: slim (domain, hash, id, tok)
    * rows through the bounded [[BudgetAgg]] — per-task state is the budget
    * prefix, never a hot domain's full row set, and no per-domain window.
    * Rows with null/non-long ids are dropped ([[hashSample]] posture);
    * null token counts cost 1. */
  def capPerDomainTokens(df: DataFrame, idCol: String, domainCol: String,
      tokCol: String, budget: Long): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val slim = df
      .select(col(domainCol).cast("string").as("__dom"),
        expr(s"try_cast(`$idCol` as bigint)").as("__id"),
        coalesce(col(tokCol).cast("long"), lit(1L)).as("__tok"))
      .filter(col("__id").isNotNull)
      .as[(String, Long, Long)]
      .mapPartitions(_.map { case (dom, id, tok) =>
        (dom, Hashing.splitmix64(id), id, tok)
      })
    val kept = slim.groupByKey(_._1)
      .agg(new BudgetAgg(budget).toColumn)
      .flatMap { case (dom, prefix) =>
        var before = 0L
        prefix.iterator.map { case (_, id, tok) =>
          val r = (dom, id, before)
          before += math.max(tok, 1L)
          r
        }
      }
      .toDF("__kept_dom", "__kept_id", "tokens_before")
    df.join(kept,
        expr(s"try_cast(`$idCol` as bigint)") === col("__kept_id") &&
          col(domainCol).cast("string") <=> col("__kept_dom"))
      .drop("__kept_id", "__kept_dom")
  }

  /** Per-stratum [[prioritySample]]: an independent sequential-Poisson
    * draw of `kPerStratum` rows inside every `stratumCol` value — the
    * "keep the best-weighted slice of EACH language/source, sized equally"
    * selection, where the global draw would let a large stratum crowd out
    * small ones. The rank key is identical to the global form (priority =
    * splitmix64(id) div max(w,1), ties by id), so a row's priority does
    * not depend on its stratum — restratifying never re-randomizes.
    *
    * Scale shape: [[capPerDomain]]'s exactly — slim (stratum, priority,
    * id) rows through the bounded [[MinKAgg]] (per-task state ≤ k per
    * stratum, exchange ≤ k rows per (map partition, stratum), a hot
    * stratum never concentrates on one task), kept set equi-joins back on
    * (stratum, id). Appends `priority` and `stratum_rank` (1-based). */
  def prioritySampleByStratum(df: DataFrame, idCol: String, weightCol: String,
      stratumCol: String, kPerStratum: Int): DataFrame = {
    require(kPerStratum >= 1, "kPerStratum must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val slim = df
      .select(col(stratumCol).cast("string").as("__s"),
        expr(s"try_cast(`$idCol` as bigint)").as("__id"),
        expr(s"try_cast(`$weightCol` as bigint)").as("__w"))
      .filter(col("__id").isNotNull && col("__w").isNotNull)
      .as[(String, Long, Long)]
      .mapPartitions(_.map { case (s, id, w) =>
        val u = (Hashing.splitmix64(id) >>> 3) + 1L
        (s, u / math.max(w, 1L), id)
      })
    val kept = slim.groupByKey(_._1)
      .agg(new MinKAgg(kPerStratum).toColumn)
      .flatMap { case (s, top) =>
        top.iterator.zipWithIndex.map { case ((p, id), i) => (s, id, p, (i + 1).toLong) }
      }
      .toDF("__kept_s", "__kept_id", "priority", "stratum_rank")
    // join on BOTH (stratum, id) — ids only unique within a stratum must
    // not leak rows across strata; <=> keeps a null stratum matching its
    // own kept entries
    df.join(kept,
        expr(s"try_cast(`$idCol` as bigint)") === col("__kept_id") &&
          col(stratumCol).cast("string") <=> col("__kept_s"))
      .drop("__kept_id", "__kept_s")
  }

  /** Per-domain document caps — the FineWeb/RefinedWeb output-shaping move:
    * keep at most `maxPerDomain` rows per `domainCol` value (source site,
    * URL host, shard), chosen DETERMINISTICALLY by ascending
    * (splitmix64(id), id) — a reproducible "random" pick, never `rand()`
    * and never arrival order (which varies with partitioning). Appends
    * `domain_rank` (1-based within the kept set).
    *
    * Scale shape: the ranking runs over SLIM (domain, hash, id) rows — the
    * document text never moves — through the bounded [[MinKAgg]], so
    * per-task state is ≤ k per domain, the exchange carries ≤ k rows per
    * (map partition, domain), and a hot domain (the web-crawl reality:
    * one host can be 1% of a 100 TB crawl) never concentrates its full
    * row set on one task the way a `row_number` window would. The kept
    * (id, rank) set then equi-joins back to the full rows (AQE broadcasts
    * it when small). Rows whose id is null or not castable to long cannot
    * be ranked deterministically and are dropped, matching [[hashSample]]'s
    * posture. */
  def capPerDomain(df: DataFrame, idCol: String, domainCol: String,
      maxPerDomain: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val slim = df
      .select(col(domainCol).cast("string").as("__dom"),
        expr(s"try_cast(`$idCol` as bigint)").as("__id"))
      .filter(col("__id").isNotNull)
      .as[(String, Long)]
      .mapPartitions(_.map { case (dom, id) => (dom, Hashing.splitmix64(id), id) })
    val kept = slim.groupByKey(_._1)
      .agg(new MinKAgg(maxPerDomain).toColumn)
      .flatMap { case (dom, top) =>
        top.iterator.zipWithIndex.map { case ((_, id), i) => (dom, id, (i + 1).toLong) }
      }
      .toDF("__kept_dom", "__kept_id", "domain_rank")
    // join on BOTH (domain, id): ids only unique within a domain (shard-
    // local ids are common) must not leak rows across domains; <=> keeps a
    // null domain matching its own kept entries
    df.join(kept,
        expr(s"try_cast(`$idCol` as bigint)") === col("__kept_id") &&
          col(domainCol).cast("string") <=> col("__kept_dom"))
      .drop("__kept_id", "__kept_dom")
  }

  /** Stratified hash sampling: a DIFFERENT keep-fraction per stratum value
    * (e.g. downsample English to 10% while keeping low-resource languages
    * whole — the standard corpus-rebalancing move). Same deterministic
    * bucket-vs-cut comparison as [[hashSample]], so membership is stable
    * across reruns and never resamples a stratum when another's fraction
    * changes; strata missing from `fracs` keep `default`. Codegen'd
    * when-chain over the bucket — still a pure map stage, no shuffle. */
  def hashSampleStratified(df: DataFrame, idCol: String, stratumCol: String,
      fracs: Map[String, Double], default: Double = 1.0): DataFrame = {
    val cut = fracs.toSeq.sortBy(_._1).foldLeft(when(lit(false), lit(0L))) {
      case (acc, (value, f)) =>
        acc.when(col(stratumCol) === lit(value), lit(math.round(f * 10000)))
    }.otherwise(lit(math.round(default * 10000)))
    withBucket(df, idCol)
      .filter(col("__bucket") < cut)
      .drop("__bucket")
  }

  /** Deterministic global training-order shuffle, shard-parallel: assigns
    * every row a shard `pmod(splitmix64(id), nShards)` and a 1-based
    * position within its shard ordered by (splitmix64(id) signed, id).
    * Reading shards in order 0..n−1, positions ascending, visits the corpus
    * in a reproducible pseudo-random permutation — the "global shuffle"
    * every training run needs, WITHOUT a global sort: shard routing is a
    * pure map stage, and the within-shard ranking is a window partitioned
    * by shard, so the n shards rank in parallel and no single task ever
    * orders more than |corpus|/n rows. Unlike [[capPerDomain]]'s domains,
    * shards are uniform BY CONSTRUCTION (a hash mod), so the partitioned
    * window's per-partition load is balanced and the bounded-aggregator
    * escape hatch is unnecessary — this is the case where a window is the
    * right tool. Rows with null/non-long ids are dropped (same posture as
    * [[hashSample]]: no deterministic place for them).
    *
    * Output: the input columns + (shard, pos). Writers then
    * `partitionBy("shard")` so each shard lands as its own file set,
    * sorted — the at-rest layout a data loader streams sequentially. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val in = df.withColumn("__id_long", expr(s"try_cast(`$idCol` as bigint)"))
      .filter(col("__id_long").isNotNull)
    val idIdx = in.schema.fieldIndex("__id_long")
    val outSchema = in.schema.add("__h", LongType, nullable = false)
    val hashed = in.mapPartitions { rows =>
      rows.map(row => Row.fromSeq(row.toSeq :+ Hashing.splitmix64(row.getLong(idIdx))))
    }(Encoders.row(outSchema))
    hashed
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
          .orderBy(col("__h"), col("__id_long"))).cast("long"))
      .drop("__h", "__id_long")
  }

  /** Epoch-aware mixture upsampling — mixture recipes assign each domain
    * an EFFECTIVE EPOCH COUNT (GPT-3's Wikipedia at 3.4 epochs, curated
    * sources repeated, web crawl sub-sampled): each row is replicated
    * floor(e) times plus one more with probability frac(e), decided
    * deterministically from the row's own id. e < 1 degenerates to plain
    * downsampling (keep ∝ e), e = 2.5 emits 2 or 3 copies — so one
    * operator covers the whole repetition axis of a mixture.
    *
    * The fractional coin is `top32(splitmix64(id)) < floor(frac(e)·2^32)`:
    * Long-exact in the kernel and HUGEINT-exact in the oracle (the one
    * double op, frac·2^32, is the same IEEE multiply in both engines), so
    * q_mix_epochs verifies every copy decision bit-for-bit — the
    * [[hashSample]] determinism posture extended to replication.
    *
    * Scale shape: a pure flatMap — no shuffle, no join-back; the appended
    * `epoch` column (0 ≤ epoch < copies) gives downstream shuffles
    * ([[shuffleShards]], packing) a distinct key per copy. Rows with
    * null/non-long ids are dropped ([[hashSample]] posture); a domain
    * absent from `epochs` gets `defaultEpochs`. */
  def upsampleEpochs(df: DataFrame, idCol: String, domainCol: String,
      epochs: Map[String, Double], defaultEpochs: Double = 1.0): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(e => e >= 0.0 && e <= 1000.0),
      "epoch counts must be in [0, 1000]")
    val in = df.withColumn("__id_long", expr(s"try_cast(`$idCol` as bigint)"))
      .filter(col("__id_long").isNotNull)
      .withColumn("__dom", col(domainCol).cast("string"))
    val idIdx = in.schema.fieldIndex("__id_long")
    val domIdx = in.schema.fieldIndex("__dom")
    val outSchema = in.schema.add("epoch", LongType, nullable = false)
    in.mapPartitions { rows =>
      rows.flatMap { row =>
        val e = epochs.getOrElse(row.getString(domIdx), defaultEpochs)
        val whole = math.floor(e).toLong
        val frac32 = math.floor((e - math.floor(e)) * 4294967296.0).toLong
        val extra =
          if ((Hashing.splitmix64(row.getLong(idIdx)) >>> 32) < frac32) 1L else 0L
        val copies = whole + extra
        (0L until copies).iterator.map(ep => Row.fromSeq(row.toSeq :+ ep))
      }
    }(Encoders.row(outSchema)).drop("__id_long", "__dom")
  }

  /** Per-document hashed-feature buckets for [[dsirWeights]]: unigrams and
    * bigrams of the lowercased space-tokens, FNV-1a'd into `buckets` slots
    * (pmod of the signed hash — the [[Hashing.hashString]] / HashOracle
    * replay pair). */
  private[llm] def dsirFeatures(text: String, buckets: Int): Iterator[Int] = {
    if (text == null) return Iterator.empty
    val bl = buckets.toLong
    def bucketOf(g: String): Int = (((Hashing.hashString(g) % bl) + bl) % bl).toInt
    val w = text.toLowerCase.split(" ", -1)
    w.iterator.map(bucketOf) ++
      (0 until w.length - 1).iterator.map(i => bucketOf(w(i) + " " + w(i + 1)))
  }

  /** DSIR importance weights (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", NeurIPS 2023): score every corpus
    * document by how much its hashed-n-gram distribution looks like a
    * small trusted TARGET set. Features are unigram+bigram buckets
    * ([[dsirFeatures]]); both bag-of-buckets models are add-one smoothed,
    * and the per-bucket log ratio is frozen to an INTEGER micro-nat
    * λ_b = ⌊ln((T_b+1)(S+B) / ((S_b+1)(T+B)))·10⁶ + 0.5⌋ (one double ln of
    * exact-integer operands — [[graft.llm.TextAnalysis.lmScore]]'s replay
    * posture; exact while the count products stay under 2⁵³, i.e. to
    * ~10¹⁵ feature-corpora). A document's log weight is then the plain
    * integer sum Σ λ_bucket over its feature occurrences — order-free.
    *
    * Scale shape: two histogram passes (B-bounded, map-side combined,
    * collected at ≤ `buckets` rows) plus one broadcast-λ map stage over
    * the corpus — nothing is |corpus|-bounded on any single node.
    * Output: (idCol, logw_micronats). */
  /** B-bucket feature histogram of a text column through [[dsirFeatures]]
    * — ONE definition shared by DSIR and the NB quality classifier: the
    * kernel is replay-critical (pinned bit-for-bit by the DuckDB oracles),
    * so it must not exist twice to diverge. */
  private[llm] def featureHistogram(d: DataFrame, textCol: String, buckets: Int): Array[Long] = {
    val spark = d.sparkSession
    import spark.implicits._
    val b = buckets
    val arr = new Array[Long](b)
    d.select(col(textCol).cast("string")).as[String]
      .flatMap(dsirFeatures(_, b)).toDF("b")
      .groupBy("b").agg(count(lit(1)).as("c")).as[(Int, Long)].collect()
      .foreach { case (bk, c) => arr(bk) = c }
    arr
  }

  /** The add-one-smoothed integer micro-nat log ratio both selection
    * operators freeze: floor(ln((a+1)(bTot+B) / ((b+1)(aTot+B))) * 1e6 +
    * 0.5) — one double ln of exact-integer double products. */
  private[llm] def smoothedLogRatioMicro(aCnt: Long, aTot: Long,
      bCnt: Long, bTot: Long, buckets: Int): Long =
    math.floor(math.log(
      ((aCnt + 1).toDouble * (bTot + buckets).toDouble) /
        ((bCnt + 1).toDouble * (aTot + buckets).toDouble)) * 1000000.0 + 0.5).toLong

  /** Exact dyadic-rational uniform in (0,1) from the id hash — numerator
    * below 2^52 keeps every IEEE operation exact (shared by the Gumbel
    * draw and the Pareto keep decision). */
  private[llm] def dyadicUniform(id: Long): Double =
    ((Hashing.splitmix64(id) >>> 12).toDouble + 0.5) / 4503599627370496.0

  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val b = buckets
    val tCnt = featureHistogram(target, targetTextCol, b)
    val sCnt = featureHistogram(df, textCol, b)
    val tTot = tCnt.sum
    val sTot = sCnt.sum
    val lam = Array.tabulate(b)(i => smoothedLogRatioMicro(tCnt(i), tTot, sCnt(i), sTot, b))
    val bcLam = spark.sparkContext.broadcast(lam)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val l = bcLam.value
        it.map { case (id, text) =>
          var s = 0L
          dsirFeatures(text, l.length).foreach(bk => s += l(bk))
          (id, s)
        }
      }
      .toDF(idCol, "logw_micronats")
  }

  /** Gumbel-top-k importance RESAMPLING over [[dsirWeights]] output — the
    * sampling (not argmax) arm of DSIR: key = logw + Gumbel noise, where
    * the noise is a pure function of the id (u = (⌊splitmix64(id)/2¹²⌋ +
    * ½)/2⁵², EXACT in IEEE since the numerator stays below 2⁵², then
    * g = ⌊−ln(−ln(u))·10⁶ + 0.5⌋ — two chained lns, the one place the
    * engine accepts a two-deep transcendental; a replay flip needs both
    * to land within an ulp of a 10⁻⁶ boundary). Selection is the
    * TakeOrdered top-k by (key DESC, id ASC); the rank window afterwards
    * orders k rows, never the corpus. Output: (rank, idCol,
    * logw_micronats, key_micronats). */
  def dsirSelect(weights: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = weights.sparkSession
    import spark.implicits._
    val keyed = weights.select(col(idCol).cast("long"), col("logw_micronats").cast("long"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, lw) =>
        val u = dyadicUniform(id)
        val gum = math.floor(-math.log(-math.log(u)) * 1000000.0 + 0.5).toLong
        (id, lw, lw + gum)
      })
      .toDF(idCol, "logw_micronats", "key_micronats")
    import org.apache.spark.sql.expressions.Window
    keyed.orderBy(col("key_micronats").desc, col(idCol)).limit(k)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("key_micronats").desc, col(idCol))).cast("long"))
      .select(col("rank"), col(idCol), col("logw_micronats"), col("key_micronats"))
  }
}
