package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Deduplication for 100 TB-scale corpora. Five tiers:
  *
  *  1. exact          — content-hash groupBy (one shuffle on a 32-byte key);
  *  2. MinHash + LSH  — shingle → 64-hash signature → banded buckets →
  *                      candidate pairs ONLY within buckets;
  *  3. SimHash        — 64-bit weighted bit signature, banded on 16-bit
  *                      chunks, Hamming-verified;
  *  4. n-gram Jaccard — exact shingle-set verification of LSH candidates;
  *  5. embedding cosine — random-hyperplane LSH buckets, cosine-verified
  *                      (see also Ann).
  *
  * NOTHING here does an all-pairs crossJoin: every candidate generation is a
  * shuffle keyed by (band, bucket-hash) — the plan a 1000-executor cluster
  * needs. Two further scale rules are load-bearing:
  *
  *  - **Slim shuffles.** Candidate generation moves only (id, band, bh)
  *    rows; the heavy signature/shingle arrays are joined back AFTER pair
  *    ids are deduplicated. (Carrying a 10 KB array payload through the
  *    bucket join + dedup shuffles is the difference between seconds and
  *    minutes at sf0.1 — measured, not theoretical.)
  *  - **Hot-bucket cap.** Bucket sizes above `maxBucket` (degenerate
  *    content) are dropped before the self-join bounds the quadratic term;
  *    near-dups inside them still surface via their other bands.
  *
  * All signatures are deterministic: hash seeds are baked into xxhash64
  * argument tuples, never Random. Shingles are hashed to longs ONCE; the 64
  * signature slots re-hash the fixed-width long, not the string.
  */
object Dedup {

  // ---- 1. exact ----

  /** Exact dedup: sha2(text) → representative id (min) + multiplicity.
    * The hash groupBy shuffles 32-byte keys, not documents. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // ---- 2. MinHash signatures + LSH bands ----

  /** Distinct lowercase word-k-shingle hashes (`__shh`: array<long>) and the
    * `numHashes`-slot MinHash signature (`__sig`): sig[j] = min over shingle
    * hashes h of mix(h, j).
    *
    * Implemented as a typed mapPartitions kernel, NOT higher-order Column
    * functions: Spark HOFs are CodegenFallback (interpreted per element), and
    * 64 slots x shingles x docs is tens of millions of lambda evaluations —
    * measured ~100 s at sf0.1 as HOF exprs vs ~1 s as a JIT'd kernel over
    * primitive arrays. Per-row scalar compute with no shuffle is exactly the
    * mapPartitions escape hatch (SURVEY brief, option d).
    * Output: (idCol: long, __shh: array<long>, __sig: array<long>).
    */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val (shh, sig) = shinglesAndSignature(text, k, numHashes)
        (id, shh, sig)
      })
      .toDF(idCol, "__shh", "__sig")
  }

  /** FNV-1a hash of the k-word shingle at every token position of one
    * document (lowercased, space-tokenized; docs shorter than k hash the
    * whole text as one shingle at position 0). Index IS the position —
    * [[repeatedSpans]] needs it; [[shingleHashes]] collapses it away. */
  private[graft] def positionalShingleHashes(text: String, k: Int): Array[Long] =
    // null text hashes to NO shingles (module posture: a null document must
    // never NPE mid-job — it contributes nothing and scores zero)
    if (text == null) Array.emptyLongArray
    else positionalShingleHashes(text.toLowerCase.split(" ", -1), k)

  /** Token-array form — callers that already tokenized (the repeatedSpans
    * kernel needs the token count too) avoid a second lowercase+split pass
    * over every byte of text. */
  private[graft] def positionalShingleHashes(toks: Array[String], k: Int): Array[Long] = {
    val nSh = math.max(toks.length - k + 1, 1)
    val sb = new java.lang.StringBuilder
    val raw = new Array[Long](nSh)
    var i = 0
    while (i < nSh) {
      sb.setLength(0)
      var t = 0
      while (t < k && i + t < toks.length) {
        if (t > 0) sb.append(' ')
        sb.append(toks(i + t))
        t += 1
      }
      raw(i) = Hashing.hashString(sb)
      i += 1
    }
    raw
  }

  /** Distinct sorted FNV-1a hashes of the k-word shingles of one document.
    * Shared by the MinHash kernel and [[decontaminate]]. */
  private[graft] def shingleHashes(text: String, k: Int): Array[Long] =
    positionalShingleHashes(text, k).distinct.sorted

  private[graft] def shinglesAndSignature(text: String, k: Int,
      numHashes: Int): (Array[Long], Array[Long]) = {
    val shh = shingleHashes(text, k)
    val sig = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      var m = Long.MaxValue
      var x = 0
      while (x < shh.length) {
        val h = Hashing.mix(shh(x), j)
        if (h < m) m = h
        x += 1
      }
      sig(j) = m
      j += 1
    }
    (shh, sig)
  }

  /** Slim banded bucket rows: (id, band, bh) only. */
  private def bucketIds(sigs: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(
      col(idCol),
      explode(expr(
        s"""transform(sequence(0, ${bands - 1}),
           |  b -> struct(b AS band, xxhash64(slice(__sig, b * $rowsPerBand + 1, $rowsPerBand)) AS bh))""".stripMargin))
        .as("__bk"))
      .select(col(idCol), col("__bk.band").as("band"), col("__bk.bh").as("bh"))

  /** Hot-bucket guard: drop buckets larger than maxBucket (groupBy + join —
    * no sort, slim rows). */
  private def capBuckets(buckets: DataFrame, maxBucket: Int): DataFrame = {
    val sizes = buckets.groupBy("band", "bh").agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucket)
    buckets.join(sizes, Seq("band", "bh")).drop("__bn")
  }

  /** Bucket-size distribution of the MinHash LSH bands — the skew
    * observability hook (max/avg bucket size, bucket count). */
  def minhashBucketStats(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val sigs = minhashSignature(df, idCol, textCol, k, numHashes).select(col(idCol), col("__sig"))
    bucketIds(sigs, idCol, bands, numHashes / bands)
      .groupBy("band", "bh").agg(count(lit(1)).as("n"))
      .groupBy().agg(
        max("n").cast("long").as("max_bucket"),
        avg("n").as("avg_bucket"),
        count(lit(1)).cast("long").as("n_buckets"))
  }

  /** Pair ids from a precomputed signature table. Only (id, band, bh) ever
    * moves through a shuffle here. */
  private def pairIdsFromSigs(sigs: DataFrame, idCol: String,
      bands: Int, rowsPerBand: Int, maxBucket: Int): DataFrame = {
    val buckets = capBuckets(bucketIds(sigs, idCol, bands, rowsPerBand), maxBucket)
    buckets.select(col("band"), col("bh"), col(idCol).as("id_a"))
      .join(buckets.select(col("band"), col("bh"), col(idCol).as("id_b")), Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
  }

  /** Deduplicated candidate pair ids from banded buckets. */
  def candidatePairIds(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16, maxBucket: Int = 500): DataFrame =
    pairIdsFromSigs(
      minhashSignature(df, idCol, textCol, k, numHashes).select(col(idCol), col("__sig")),
      idCol, bands, numHashes / bands, maxBucket)

  /** MinHash near-dup pairs: banded candidates + estimated Jaccard
    * (fraction of equal signature slots) ≥ threshold. Signatures join back
    * onto the deduped pair ids. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String, threshold: Double,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16, maxBucket: Int = 500,
      cacheSignatures: Boolean = true): DataFrame = {
    // the signature kernel is the dominant map cost — compute ONCE, cache,
    // and feed both the bucketing path and the verification join-back.
    // NOTE: the cache entry lives until session end (CacheManager holds
    // it); long-lived services calling this repeatedly should pass
    // cacheSignatures=false (recompute) or manage the signature table
    // themselves via minhashSignature + pairIdsFromSigs.
    val sigBase = minhashSignature(df, idCol, textCol, k, numHashes)
      .select(col(idCol), col("__sig"))
    val sig = if (cacheSignatures) sigBase.persist() else sigBase
    val ids = pairIdsFromSigs(sig, idCol, bands, numHashes / bands, maxBucket)
    ids
      .join(sig.select(col(idCol).as("id_a"), col("__sig").as("__sig_a")), Seq("id_a"))
      .join(sig.select(col(idCol).as("id_b"), col("__sig").as("__sig_b")), Seq("id_b"))
      .withColumn("est_jaccard", expr(
        s"size(filter(zip_with(__sig_a, __sig_b, (x, y) -> x = y), v -> v)) / CAST($numHashes AS DOUBLE)"))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  // ---- 4. exact n-gram Jaccard verification ----

  /** Exact shingle-hash-set Jaccard over LSH candidates (never all pairs). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String, threshold: Double,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16, maxBucket: Int = 500,
      cacheSignatures: Boolean = true): DataFrame = {
    // one signature pass feeds banding (__sig) and verification (__shh);
    // see minhashPairs for the cache-lifetime caveat
    val sigBase = minhashSignature(df, idCol, textCol, k, numHashes)
    val sigs = if (cacheSignatures) sigBase.persist() else sigBase
    val ids = pairIdsFromSigs(sigs.select(col(idCol), col("__sig")), idCol,
      bands, numHashes / bands, maxBucket)
    val sh = sigs.select(col(idCol), col("__shh"))
    ids
      .join(sh.select(col(idCol).as("id_a"), col("__shh").as("__sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("__shh").as("__sh_b")), Seq("id_b"))
      .withColumn("jaccard", expr(
        """CAST(size(array_intersect(__sh_a, __sh_b)) AS DOUBLE) /
          |size(array_union(__sh_a, __sh_b))""".stripMargin))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact shingle-set CONTAINMENT over LSH candidates — the asymmetric
    * twin of [[ngramJaccardPairs]] for doc-in-doc detection (Broder 1997
    * distinguishes resemblance from containment): a page quoting a whole
    * smaller document scores near-1 containment but low Jaccard, so a
    * Jaccard-thresholded dedup keeps both copies of the quoted text.
    * Containment here is the max-direction form |A∩B| / min(|A|,|B|) —
    * symmetric in the pair, 1.0 exactly when one shingle set contains the
    * other. Emits the integer operands (n_a, n_b, n_inter) alongside the
    * one double division so downstream policy (and the oracle) can work
    * in exact integers.
    *
    * Candidate generation is the SAME banded-MinHash path as every other
    * verify op — never all-pairs. Note the recall caveat inherent to
    * MinHash banding: signature agreement tracks JACCARD, so a tiny doc
    * fully contained in a huge one can band apart; at matched sizes (the
    * boilerplate/quote case this targets) recall matches the Jaccard
    * path's. Output: (id_a, id_b, n_a, n_b, n_inter, containment). */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String, threshold: Double,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16, maxBucket: Int = 500,
      cacheSignatures: Boolean = true): DataFrame = {
    // one signature pass feeds banding (__sig) and verification (__shh);
    // see minhashPairs for the cache-lifetime caveat
    val sigBase = minhashSignature(df, idCol, textCol, k, numHashes)
    val sigs = if (cacheSignatures) sigBase.persist() else sigBase
    val ids = pairIdsFromSigs(sigs.select(col(idCol), col("__sig")), idCol,
      bands, numHashes / bands, maxBucket)
    val sh = sigs.select(col(idCol), col("__shh"))
    ids
      .join(sh.select(col(idCol).as("id_a"), col("__shh").as("__sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("__shh").as("__sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("CAST(size(__sh_a) AS BIGINT)").as("n_a"),
        expr("CAST(size(__sh_b) AS BIGINT)").as("n_b"),
        expr("CAST(size(array_intersect(__sh_a, __sh_b)) AS BIGINT)").as("n_inter"))
      .withColumn("containment",
        col("n_inter").cast("double") / least(col("n_a"), col("n_b")))
      .filter(col("containment") >= threshold)
  }

  // ---- 3. SimHash ----

  /** 64-bit SimHash over word tokens: per-bit vote of token hashes, packed.
    * Typed kernel (see minhashSignature scaladoc for why not HOF exprs).
    * Output: (idCol: long, simhash: long). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, simhashOf(text)) })
      .toDF(idCol, "simhash")
  }

  /** The per-document SimHash kernel behind [[simhash]] and the streaming
    * near-dup filter — one definition so batch and stream fingerprint
    * identically. */
  private[graft] def simhashOf(text: String): Long = {
    val votes = new Array[Int](64)
    val toks = text.toLowerCase.split(" ", -1)
    var i = 0
    while (i < toks.length) {
      val h = Hashing.hashString(toks(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sh |= (1L << b)
      b += 1
    }
    sh
  }

  /** SimHash near-dup pairs: band each 64-bit signature into four 16-bit
    * chunks (any equal chunk ⇒ candidate; Hamming ≤ maxHamming verifies).
    * A pair within Hamming distance 3 always shares ≥1 exact chunk
    * (pigeonhole), so recall is exact for maxHamming ≤ 3. Rows stay slim:
    * (id, simhash, band, bh) is 32 bytes. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3,
      maxBucket: Int = 500): DataFrame =
    hammingPairs64(simhash(df, idCol, textCol), idCol, "simhash", maxHamming, maxBucket)

  /** All pairs within `maxHamming` bits over ANY 64-bit fingerprint column
    * — the banded candidate join + bit_count verify shared by
    * [[simhashPairs]] (text fingerprints) and the multimodal perceptual-
    * hash dedup ([[graft.llm.Multimodal.imageNearDupPairs]]). Four 16-bit
    * bands: a pair within Hamming ≤ 3 shares at least one exact band
    * (pigeonhole over 4 bands), so recall is EXACT for maxHamming ≤ 3;
    * beyond 3 a pair surfaces only when one of its bands happens to
    * collide — the standard LSH recall/threshold trade every caller of
    * the wider radii opts into knowingly (and the replay oracles model
    * the banding, not brute force). Scale shape: (id, hash, band, bh)
    * rows are 32 bytes, candidates gather per (band, bh) bucket — never
    * an all-pairs comparison — and degenerate buckets (identical
    * fingerprints corpus-wide) are capped like every banded dedup here. */
  def hammingPairs64(hashed: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int, maxBucket: Int = 500): DataFrame = {
    require(maxHamming >= 0, s"maxHamming must be non-negative, got $maxHamming")
    val banded = capBuckets(
      hashed.select(
        col(idCol), col(hashCol),
        explode(expr(
          s"transform(sequence(0, 3), b -> struct(b AS band, (shiftright($hashCol, b * 16) & 65535) AS bh))"))
          .as("__bk"))
        .select(col(idCol), col(hashCol), col("__bk.band").as("band"), col("__bk.bh").as("bh")),
      maxBucket)
    banded.select(col("band"), col("bh"), col(idCol).as("id_a"), col(hashCol).as("__h_a"))
      .join(banded.select(col("band"), col("bh"), col(idCol).as("id_b"), col(hashCol).as("__h_b")),
        Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", expr("bit_count(__h_a ^ __h_b)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // ---- semantic dedup (cluster-then-compare over embeddings) ----

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", 2023): coarse-cluster the
    * embeddings with the IVF quantizer ([[Ivf.train]]/[[Ivf.index]]),
    * compare pairs ONLY within a cluster (cosine ≥ threshold), resolve the
    * pair graph transitively ([[clusters]]), keep the min-id canonical per
    * semantic cluster.
    *
    * Scale shape: k grows with the corpus so list size n/k stays bounded;
    * the only corpus-wide shuffle keys on list_id; the within-list
    * self-join is quadratic ONLY in list size (a hot list beyond `maxList`
    * is dropped from pairing — same guard as the banded dedups — so a
    * degenerate quantizer can't go quadratic in the corpus); the
    * contraction rounds then move 16-byte edges. Output:
    * (idCol, cluster_id, is_canonical) — [[dropDuplicateClusters]]-style
    * filtering composes on top. */
  def semanticDedup(df: DataFrame, idCol: String, embCol: String,
      threshold: Double, k: Int = 16, iters: Int = 2,
      maxList: Int = 100000): DataFrame = {
    val e = df.select(col(idCol).cast("long").as("vec_id"), col(embCol).as("embedding"))
    val cents = Ivf.train(e, k, iters)
    // persist: the assignment map stage feeds THREE consumers (the size
    // cap and both sides of the within-list self-join, each with its own
    // projection) — without it the full corpus scan + argmax runs 3×
    val indexed = Ivf.index(e, cents).select("vec_id", "embedding", "list_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = indexed.groupBy("list_id").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxList)
    val capped = indexed.join(sizes, Seq("list_id")).drop("__n")
    val pairs = capped
      .select(col("list_id"), col("vec_id").as("id_a"), col("embedding").as("__e_a"))
      .join(capped.select(col("list_id"), col("vec_id").as("id_b"), col("embedding").as("__e_b")),
        Seq("list_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(graft.functions.Exprs.cosine(col("__e_a"), col("__e_b")) >= threshold)
      .select("id_a", "id_b")
    clusters(df.select(col(idCol)), idCol, pairs)
  }

  // ---- benchmark decontamination (n-gram overlap vs an eval set) ----

  /** (id, sh) rows: one row per distinct k-shingle hash of each document —
    * the slim exploded form of [[shingleHashes]]. */
  private def shingleRows(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) => shingleHashes(text, k).iterator.map(sh => (id, sh)) }
      .toDF(idCol, "__sh")
  }

  /** Test-set decontamination (the GPT-3 appendix-C / PaLM recipe): flag
    * every training document sharing at least one k-word shingle with ANY
    * benchmark document, so evaluation data can be scrubbed from the
    * training corpus before training. k = 13 is the published n-gram
    * order.
    *
    * Shape for 100 TB: the benchmark side is SMALL by nature (eval sets
    * are thousands of docs), so its distinct shingle hashes are pinned
    * broadcast; the training side streams through one map stage (shingle
    * kernel), a broadcast semi-join marks hits, and a broadcast left join
    * attaches the flag — the corpus is never shuffled. Shingle identity is
    * the FNV-1a hash ([[Hashing.hashString]]), shared with the MinHash
    * kernel, so the DuckDB oracle replays the decision bit-for-bit.
    * Output: every `train` column plus `contaminated: boolean`. */
  def decontaminate(train: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, k: Int = 13): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    // ONE corpus pass, ZERO shuffle: the bench shingle set is small by the
    // operator's premise (eval suites), so the flag is computed inline per
    // document against the broadcast hash set — never an exploded shingle
    // table, a second corpus scan, or an id-keyed join (whose strategy
    // would degrade to a full corpus shuffle exactly when a pathological
    // benchmark flags many docs). `exists` short-circuits on the first hit.
    val benchSh: Set[Long] = bench.select(col(benchTextCol)).as[String]
      .flatMap(t => shingleHashes(t, k).iterator)
      .distinct().collect().toSet
    val bc = spark.sparkContext.broadcast(benchSh)
    val tIdx = train.schema.fieldIndex(textCol)
    val outSchema = train.schema.add("contaminated",
      org.apache.spark.sql.types.BooleanType, nullable = false)
    train.mapPartitions { rows =>
      val ref = bc.value
      rows.map { row =>
        val t = row.getString(tIdx)
        val hit = t != null && shingleHashes(t, k).exists(ref.contains)
        Row.fromSeq(row.toSeq :+ hit)
      }
    }(Encoders.row(outSchema))
  }

  /** [[decontaminate]] for a benchmark/blocklist side TOO BIG to broadcast
    * exactly: identical output, constant broadcast memory.
    *
    * The exact form pins the reference's full distinct-shingle set to every
    * executor — fine for eval suites (thousands of docs), wrong when the
    * scrub list is itself corpus-scale (a previous training run, a licensed-
    * content ledger: billions of shingles). This variant broadcasts only a
    * fixed 2^b-bit Bloom filter of the reference shingles and runs in two
    * stages:
    *
    *  1. map pass: each doc probes its shingles against the filter and
    *     keeps the (rare, by the operator's premise) maybe-hits;
    *  2. exact verify: ONLY the suspects' hit shingles explode into rows
    *     and LEFT SEMI join the distributed reference shingle table —
    *     Bloom false positives die here, so the result is EXACT (the
    *     filter's one-sidedness does the work: a false `maybe` costs a
    *     verify row, a true `no` is definitive and free).
    *
    * The verify shuffle is proportional to suspect×hit counts, not corpus
    * size; the reference set is never collected. Same deterministic
    * FNV/splitmix positions as [[graft.llm.Bloom]], so q_decontaminate_bloom
    * shares the exact form's oracle verbatim — the two paths are
    * row-identical by construction (LlmSpec asserts it). */
  def decontaminateBloom(train: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, k: Int = 13,
      bloomBits: Int = 1 << 20, bloomK: Int = 3): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val benchSh = bench.select(col(benchTextCol)).as[String]
      .flatMap(t => shingleHashes(t, k).iterator)
      .toDF("__bsh").distinct()
    val filter = Bloom.buildFromHashes(benchSh, "__bsh", bloomBits, bloomK)
    val bc = spark.sparkContext.broadcast(filter)
    // the kernel pass emits ONLY suspect (id, shingle) pairs — no full
    // rows, so nothing needs persisting and the shingle kernel runs once;
    // the final flag-attach is a second plain SCAN of train, not a second
    // kernel pass
    val suspects = train
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        if (t == null) Iterator.empty
        else {
          val f = bc.value
          shingleHashes(t, k).iterator
            .filter(Bloom.containsHash(f, _, bloomK)).map(sh => (id, sh))
        }
      }
      .toDF("__cid", "__sh")
    val confirmed = suspects
      .join(benchSh, col("__sh") === col("__bsh"), "left_semi")
      .select(col("__cid")).distinct()
      .withColumn("__confirmed", lit(true))
    train.join(confirmed, col(idCol).cast("long") === col("__cid"), "left")
      .withColumn("contaminated", coalesce(col("__confirmed"), lit(false)))
      .drop("__cid", "__confirmed")
  }

  /** SEMANTIC decontamination — the embedding-space member of the family:
    * flag corpus rows whose embedding is within `threshold` cosine of ANY
    * eval-set embedding. [[decontaminate]] catches verbatim k-gram
    * overlap, [[crossNearDup]] catches lexical near-copies; a translated
    * or fully-paraphrased eval item evades both and only the embedding
    * distance sees it (the leakage class reported for multilingual
    * benchmarks — public contamination literature, e.g. the GPT-3 §C /
    * PaLM appendix methodology, rebuilt here on cosine proximity).
    *
    * Scale shape: eval suites are small by the operator's premise
    * (thousands of vectors), so the eval side BROADCASTS and every corpus
    * row scores against it inside one codegen'd stage (the q_ann_brute
    * posture) — the corpus is never shuffled; the per-id argmax is a
    * map-side-combinable max(struct), not a window. For an eval side too
    * big to broadcast, compose [[graft.llm.Ann.lshTopKAgg]] with the eval
    * set as queries instead — same verdict, bucketed candidates.
    *
    * Output: (idCol, near_eval_id, max_cos, contaminated); ties on
    * max_cos resolve to the LOWEST eval id (max of (cos, -id)), so the
    * report is deterministic. Rows with a null/zero-norm embedding score
    * 0.0 everywhere and come out clean. */
  def semanticDecontaminate(corpus: DataFrame, idCol: String, embCol: String,
      eval: DataFrame, evalIdCol: String, evalEmbCol: String,
      threshold: Double): DataFrame = {
    val paired = corpus.select(col(idCol), col(embCol))
      .crossJoin(broadcast(eval.select(
        col(evalIdCol).cast("long").as("__eid"), col(evalEmbCol).as("__ee"))))
      .select(col(idCol),
        graft.functions.Exprs.cosine(col(embCol), col("__ee")).as("__cos"),
        col("__eid"))
    paired
      .groupBy(idCol)
      .agg(max(struct(col("__cos").as("c"), (-col("__eid")).as("n"))).as("__m"))
      .select(col(idCol),
        (-col("__m.n")).as("near_eval_id"),
        col("__m.c").as("max_cos"),
        (col("__m.c") >= threshold).as("contaminated"))
  }

  /** Cross-corpus near-duplicate detection — [[minhashPairs]] with the two
    * sides split: which TRAIN documents are near-duplicates of a REFERENCE
    * corpus (an eval suite, a licensed-content ledger, a previous training
    * run)? [[decontaminate]] answers this for verbatim k-gram overlap;
    * paraphrased or lightly-edited contamination needs the Jaccard form —
    * the scrub GPT-3 §4 ran against its benchmarks.
    *
    * Same kernel, bands, and hot-bucket cap as [[minhashPairs]], but the
    * band join is STRICTLY across corpora (train×ref, never train×train —
    * in-corpus duplication is [[minhashPairs]]' job), and the cap applies
    * to the REFERENCE side's buckets (the side that degenerates when the
    * blocklist contains boilerplate). Scale shape: signatures computed once
    * per side, slim (id, band, bh) shuffles; candidate verification joins
    * signatures back by id, so the corpus text never shuffles.
    *
    * Output: (id, ref_id, est_jaccard ≥ threshold) candidate matches; a
    * train doc with no row is clean. */
  def nearDupAgainst(train: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refIdCol: String, refTextCol: String, threshold: Double,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16,
      maxBucket: Int = 500, cacheSignatures: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    // each side's signature feeds banding AND the est_jaccard verify join —
    // without persist the expensive shingle+signature kernel runs twice per
    // side per action; see minhashPairs for the cache-lifetime caveat
    val tSigBase = minhashSignature(train, idCol, textCol, k, numHashes)
      .select(col(idCol).cast("long").as("id"), col("__sig"))
    val tSig = if (cacheSignatures) tSigBase.persist() else tSigBase
    val rSigBase = minhashSignature(ref, refIdCol, refTextCol, k, numHashes)
      .select(col(refIdCol).cast("long").as("ref_id"), col("__sig").as("__rsig"))
    val rSig = if (cacheSignatures) rSigBase.persist() else rSigBase
    val tB = bucketIds(tSig, "id", bands, rowsPerBand)
    val rB = capBuckets(
      bucketIds(rSig.select(col("ref_id"), col("__rsig").as("__sig")), "ref_id", bands, rowsPerBand),
      maxBucket)
    val cand = tB.join(rB, Seq("band", "bh"))
      .select("id", "ref_id").dropDuplicates("id", "ref_id")
    cand
      .join(tSig, Seq("id"))
      .join(rSig, Seq("ref_id"))
      .withColumn("est_jaccard", expr(
        s"size(filter(zip_with(__sig, __rsig, (x, y) -> x = y), v -> v)) / CAST($numHashes AS DOUBLE)"))
      .filter(col("est_jaccard") >= threshold)
      .select("id", "ref_id", "est_jaccard")
  }

  /** Span-level decontamination — the surgical form of [[decontaminate]]:
    * instead of flagging (and typically dropping) any document sharing a
    * k-gram with the benchmark, CUT the matching spans and keep the rest
    * (Lee et al. ACL 2022's dedup-then-train posture applied to
    * contamination: most of a long document is innocent; dropping it for
    * one quoted paragraph wastes data, keeping it verbatim leaks the eval).
    *
    * Every token position covered by a bench-matching k-gram (match at p
    * covers [p, p+k) clamped to doc length — the [[repeatedSpans]] covering
    * rule; a doc shorter than k tokens that matches is covered whole) is
    * removed; adjacent/overlapping matches merge into maximal islands.
    * Matching is case-insensitive ([[shingleHashes]] lowercases), removal
    * operates on the ORIGINAL tokens, and the survivors rejoin with single
    * spaces.
    *
    * Output: (idCol, text_clean, n_removed, n_spans); a null text yields
    * (id, null, 0, 0). Scale shape: ONE corpus pass, zero shuffle — the
    * bench shingle set broadcasts ([[decontaminate]]'s eval-suite premise;
    * compose with [[decontaminateBloom]]'s filter+verify when the
    * reference is corpus-scale). */
  def scrubSpans(train: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, k: Int = 13): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val benchSh: Set[Long] = bench.select(col(benchTextCol)).as[String]
      .flatMap(t => shingleHashes(t, k).iterator)
      .distinct().collect().toSet
    val bc = spark.sparkContext.broadcast(benchSh)
    train.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val ref = bc.value
        rows.map { case (id, text) =>
          if (text == null) (id, null: String, 0L, 0L)
          else {
            val orig = text.split(" ", -1)
            val hashes = positionalShingleHashes(text, k)
            val n = orig.length
            val covered = new Array[Boolean](n)
            var p = 0
            while (p < hashes.length) {
              if (ref.contains(hashes(p))) {
                // a short-text "whole document" shingle covers [0, n)
                val end = if (hashes.length == 1 && n < k) n else math.min(p + k, n)
                var i = p
                while (i < end) { covered(i) = true; i += 1 }
              }
              p += 1
            }
            var nRemoved = 0L
            var nSpans = 0L
            val kept = new scala.collection.mutable.ArrayBuffer[String](n)
            var i = 0
            while (i < n) {
              if (covered(i)) {
                nRemoved += 1
                if (i == 0 || !covered(i - 1)) nSpans += 1
              } else kept += orig(i)
              i += 1
            }
            (id, kept.mkString(" "), nRemoved, nSpans)
          }
        }
      }
      .toDF(idCol, "text_clean", "n_removed", "n_spans")
  }

  /** Shingle-novelty scoring: what fraction of each document's distinct
    * k-word shingles is ABSENT from a reference corpus — the continuous
    * form of [[decontaminate]] (which flags any overlap, this measures how
    * much). Use: novelty floors when assembling an update corpus against
    * what a model already trained on, or contamination ratios against an
    * eval suite. Ratios are divisions of exact integer counts.
    *
    * Same shape as [[decontaminate]]: the reference side is small by
    * nature, its distinct shingle hashes broadcast; scoring is one typed
    * map stage over the document scan (the per-doc distinct-shingle set is
    * computed and probed in the kernel — nothing explodes into rows).
    * Output: (idCol, n_shingles, n_novel, novelty_frac). */
  def novelty(df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String, k: Int = 13): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val refSh = reference.select(col(refTextCol)).as[String]
      .flatMap(t => shingleHashes(t, k).iterator)
      .distinct().collect()
    val bc = spark.sparkContext.broadcast(refSh.toSet)
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val ref = bc.value
        it.map { case (id, text) =>
          val sh = shingleHashes(text, k) // empty only for null text
          var novel = 0
          var i = 0
          while (i < sh.length) {
            if (!ref.contains(sh(i))) novel += 1
            i += 1
          }
          (id, sh.length.toLong, novel.toLong,
            if (sh.isEmpty) 0.0 else novel.toDouble / sh.length)
        }
      }
      .toDF(idCol, "n_shingles", "n_novel", "novelty_frac")
  }

  /** [[novelty]] for reference corpora too large to broadcast: the same
    * output, with the reference's distinct shingle hashes kept DISTRIBUTED
    * and the membership probe done as a shuffle join on the hash — both
    * sides move only slim (id, hash) / (hash) longs, so this scales to a
    * reference of any size (row-identical to the broadcast form, LlmSpec).
    * Pick by regime, the [[graft.llm.Ann]] window/agg convention: kernel
    * form for a bounded reference, join form when the reference is itself
    * corpus-scale. */
  def noveltyJoin(df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String, k: Int = 13): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val refSh = reference.select(col(refTextCol)).as[String]
      .flatMap(t => shingleHashes(t, k).iterator)
      .toDF("__sh").distinct()
      .withColumn("__seen", lit(1))
    shingleRows(df, idCol, textCol, k)
      .join(refSh, Seq("__sh"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_frac", col("n_novel").cast("double") / col("n_shingles"))
  }

  // ---- exact-substring repeated spans (corpus-level substring dedup) ----

  /** Maximal repeated substring spans — the corpus-level EXACT-substring
    * dedup signal of Lee et al., "Deduplicating Training Data Makes
    * Language Models Better" (ACL 2022). A token position is covered when
    * its k-token shingle occurs MORE THAN ONCE in the whole corpus
    * (across documents or within one — both are verbatim repetition);
    * covered positions merge into maximal spans `[span_start, span_end)`
    * in token coordinates (end clamped to the doc's token count). The
    * caller chooses the removal policy (cut spans, drop docs above a
    * repeated-fraction threshold); this operator computes WHERE the
    * repeats are.
    *
    * Lee et al. build a corpus suffix array — a sequential structure with
    * no parallel shuffle analogue. The Spark-shaped equivalent fixes a
    * minimum match length k (they report 50 BPE tokens; matches shorter
    * than k are noise by their own analysis) and works on k-token shingle
    * hashes: any repeated substring of length ≥ k covers ≥ 1 full shingle,
    * so its positions are found exactly; the merged span recovers the
    * maximal repeat up to k-1 tokens of slack at the edges.
    *
    * Shape for 100 TB: positional (id, pos, hash) rows are slim longs —
    * the text never shuffles; the duplicate-hash set comes from ONE
    * map-side-combined count on the hash (shingles repeat locally first,
    * so partial aggregation collapses hot hashes per task); the hash join
    * back marks covered positions; span merging is per-document, bounded
    * by doc length, via one groupByKey on id. Output: (idCol, span_start,
    * span_end). */
  /** Slim positional-shingle rows (__id, __pos, __sh, __n) — the shared
    * discovery input of [[repeatedSpans]] and the scrub variants; the text
    * itself never enters the pipeline built on these. */
  private def positionalRows(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null) Iterator.empty // null doc: no spans, no NPE
        else {
          val toks = text.toLowerCase.split(" ", -1)
          val sh = positionalShingleHashes(toks, k)
          sh.iterator.zipWithIndex.map { case (h, p) =>
            (id, p.toLong, h, toks.length.toLong)
          }
        }
      }
      .toDF("__id", "__pos", "__sh", "__n")
  }

  /** Gaps-and-islands merge of covered positions into maximal spans —
    * one groupByKey on id, per-doc work bounded by doc length. Input rows
    * are (__id, __pos, __n). */
  private def mergedSpans(hits: DataFrame, idCol: String, kL: Long): DataFrame = {
    val spark = hits.sparkSession
    import spark.implicits._
    hits.select(col("__id"), col("__pos"), col("__n"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (id, it) =>
        val rs = it.toArray
        val n = rs(0)._3
        val ps = rs.map(_._2).sorted
        val out = Seq.newBuilder[(Long, Long, Long)]
        var start = ps(0)
        var maxP = ps(0)
        var i = 1
        while (i < ps.length) {
          val p = ps(i)
          if (p <= maxP + kL) maxP = p
          else {
            out += ((id, start, math.min(maxP + kL, n)))
            start = p; maxP = p
          }
          i += 1
        }
        out += ((id, start, math.min(maxP + kL, n)))
        out.result().iterator
      }
      .toDF(idCol, "span_start", "span_end")
  }

  /** Fan-out factor for [[saltedDupJoin]]. 16 salts cap any single
    * shingle hash's reducer share at ~1/16 of its occurrences; the slim
    * hash side is already deduplicated per hash, so the ×16 replication
    * costs 16× a slim frame, not 16× the corpus. */
  private[graft] val DupJoinSalts = 16

  /** Skew-hardened equi-join of positional rows against a slim per-hash
    * frame (the duplicated-hash set, or keep-first's winner election —
    * both carry exactly ONE row per duplicated hash). A plain
    * `rows.join(slim, "__sh")` sends EVERY occurrence of one hash to ONE
    * reducer: on a boilerplate-heavy web corpus a single cookie-banner /
    * licence-block shingle occurs 10⁷–10⁸ times, and that reducer
    * serializes the stage — the classic skewed-key shuffle tail, in the
    * hot path of the exact-substring family. Salting splits it
    * deterministically: the rows side keys on (__sh, __pos mod S) and the
    * slim side is replicated across all S salts, so one hot hash spreads
    * over up to S reducers while the join stays an exact equi-join (every
    * positional row still meets its hash's slim row exactly once — the
    * replicated side has exactly one row per (hash, salt)). Positions
    * within one repeated run are consecutive, so __pos mod S spreads a
    * mega-shingle's occurrences uniformly across the S salts. AQE's
    * skew-join split is a runtime backstop for the same class, but only
    * for sort-merge joins it can see stats for — the salt makes the
    * guarantee structural. LlmSpec plants a hot shingle and asserts the
    * spread. */
  private[graft] def saltedDupJoin(rows: DataFrame, slim: DataFrame): DataFrame =
    rows.withColumn("__salt", pmod(col("__pos"), lit(DupJoinSalts.toLong)).cast("int"))
      .join(slim.withColumn("__salt", explode(sequence(lit(0), lit(DupJoinSalts - 1)))),
        Seq("__sh", "__salt"))
      .drop("__salt")

  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 13): DataFrame = {
    val rows = positionalRows(df, idCol, textCol, k)
    val dup = rows.groupBy("__sh").agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1).select("__sh")
    mergedSpans(saltedDupJoin(rows, dup), idCol, k.toLong)
  }

  /** Per-document repetition budget from [[repeatedSpans]]: token count,
    * tokens covered by corpus-repeated spans, and their exact-integer
    * fraction — the inputs to the standard cut-or-drop policy (Lee et al.
    * drop or trim documents dominated by verbatim repeats; boilerplate
    * pages are exactly the high-fraction tail). Every document gets a row
    * (zero-span docs score 0). One extra slim aggregation over the span
    * rows; the join back to ids is by the id column only. Output:
    * (idCol, n_tokens, repeated_tokens, repeated_frac). */
  def repeatedFraction(df: DataFrame, idCol: String, textCol: String,
      k: Int = 13): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val spans = repeatedSpans(df, idCol, textCol, k)
      .groupBy(idCol)
      .agg(sum(col("span_end") - col("span_start")).as("repeated_tokens"))
    df.select(col(idCol).cast("long").as(idCol), col(textCol)).as[(Long, String)]
      .map { case (id, text) => // null doc: 0 tokens (frac divides to NULL)
        (id, if (text == null) 0L else text.toLowerCase.split(" ", -1).length.toLong) }
      .toDF(idCol, "n_tokens")
      .join(spans, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("repeated_tokens"), lit(0L)).as("repeated_tokens"),
        (coalesce(col("repeated_tokens"), lit(0L)).cast("double") / col("n_tokens"))
          .as("repeated_frac"))
  }

  /** Corpus-level exact-substring scrub — [[repeatedSpans]] APPLIED, not
    * just measured (Lee et al. ACL'22 §4.2 deduplicate then train): every
    * token covered by a corpus-repeated ≥k-token span is removed from its
    * document and the survivors rejoin with single spaces. This is the
    * boilerplate-removal policy (remove ALL occurrences — headers, cookie
    * banners, licence blocks repeat thousands of times and every copy is
    * noise); compose with [[repeatedFraction]]'s cut-or-drop policy when
    * keep-one semantics is wanted at document granularity.
    *
    * Token hashing is case-folded ([[repeatedSpans]]'s posture) while the
    * scrub operates on the ORIGINAL tokens, mirroring [[scrubSpans]].
    *
    * Shape for 100 TB: the span discovery is [[repeatedSpans]] (slim
    * positional longs, map-side-combined dup counts — the text never
    * enters that pipeline); the apply step groups each doc's few merged
    * spans into one array and joins them back by id, so the text crosses
    * the wire ONCE (the same posture as paragraph-dedup reassembly), then
    * the cut is a per-row map kernel. Output: (idCol, text_clean,
    * n_tokens, removed_tokens); null text yields (id, null, 0, 0). */
  def scrubRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 13): DataFrame =
    cutSpans(df, idCol, textCol, repeatedSpans(df, idCol, textCol, k))

  /** Keep-ONE exact-substring dedup — Lee et al. ACL'22 §4.2 verbatim:
    * "remove all but one occurrence". The globally FIRST occurrence of
    * each corpus-repeated shingle (smallest (id, pos)) keeps its tokens;
    * every other occurrence is cut. Contrast [[scrubRepeatedSpans]], which
    * removes ALL occurrences (the boilerplate policy). Within-doc repeats
    * dedup too: "A A" keeps the first A.
    *
    * The winner election is one extra slim aggregation (min (id, pos) per
    * duplicated hash — map-side combinable) and a join back on the hash;
    * everything else is the shared discovery/merge/cut machinery.
    *
    * Caveat: the keep-one guarantee is per-SHINGLE, not per-token — a
    * winner occurrence of one shingle can still lose tokens where loser
    * spans of a DIFFERENT duplicated shingle overlap it (the merged loser
    * spans cut whatever they cover). Same k−1-token-slack approximation
    * posture as [[repeatedSpans]]. */
  def scrubRepeatedSpansKeepFirst(df: DataFrame, idCol: String, textCol: String,
      k: Int = 13): DataFrame = {
    val rows = positionalRows(df, idCol, textCol, k)
    val dup = rows.groupBy("__sh").agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1).select("__sh")
    val hits = saltedDupJoin(rows, dup)
    val winners = hits.groupBy("__sh")
      .agg(min(struct(col("__id"), col("__pos"))).as("__w"))
    val losers = saltedDupJoin(hits, winners)
      .filter(!(struct(col("__id"), col("__pos")) === col("__w")))
    cutSpans(df, idCol, textCol, mergedSpans(losers, idCol, k.toLong))
  }

  /** The apply step shared by the scrub variants: per-doc span arrays join
    * back by id (the text crosses the wire ONCE), then a map kernel cuts
    * covered tokens. `spans` must carry (idCol, span_start, span_end). */
  private def cutSpans(df: DataFrame, idCol: String, textCol: String,
      spans: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val spanLists = spans
      .groupBy(idCol)
      .agg(collect_list(struct(col("span_start").as("_1"), col("span_end").as("_2")))
        .as("__spans"))
    df.select(col(idCol).cast("long").as(idCol), col(textCol))
      .join(spanLists, Seq(idCol), "left")
      .as[(Long, String, Seq[(Long, Long)])]
      .map { case (id, text, spans) =>
        if (text == null) (id, null: String, 0L, 0L)
        else {
          val toks = text.split(" ", -1)
          val n = toks.length
          if (spans == null) (id, text, n.toLong, 0L)
          else {
            val covered = new Array[Boolean](n)
            spans.foreach { case (s, e) =>
              var i = s.toInt
              val end = math.min(e, n.toLong).toInt
              while (i < end) { covered(i) = true; i += 1 }
            }
            var removed = 0L
            val kept = new scala.collection.mutable.ArrayBuffer[String](n)
            var i = 0
            while (i < n) {
              if (covered(i)) removed += 1 else kept += toks(i)
              i += 1
            }
            (id, kept.mkString(" "), n.toLong, removed)
          }
        }
      }
      .toDF(idCol, "text_clean", "n_tokens", "removed_tokens")
  }

  // ---- 5. embedding-cosine near-dup (hyperplane LSH; shared with Ann) ----

  /** Near-duplicate pairs by embedding cosine ≥ threshold, candidates from
    * random-hyperplane LSH buckets (Ann.hyperplaneSig). Pair ids dedupe on
    * slim rows; embeddings join back for the cosine verification. */
  def embeddingPairs(df: DataFrame, idCol: String, embCol: String, threshold: Double,
      maxBucket: Int = 500): DataFrame = {
    val withSig = Ann.withNormSig(df, idCol, embCol)
    val banded = capBuckets(
      Ann.bandBuckets(withSig, idCol).select(col(idCol), col("band"), col("bh")),
      maxBucket)
    val ids = banded.select(col("band"), col("bh"), col(idCol).as("id_a"))
      .join(banded.select(col("band"), col("bh"), col(idCol).as("id_b")), Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val e = df.select(col(idCol), col(embCol))
    ids
      .join(e.select(col(idCol).as("id_a"), col(embCol).as("__e_a")), Seq("id_a"))
      .join(e.select(col(idCol).as("id_b"), col(embCol).as("__e_b")), Seq("id_b"))
      .withColumn("cosine", graft.functions.Exprs.cosine(col("__e_a"), col("__e_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  // ---- 6. duplicate-cluster resolution (pairs → connected components) ----

  /** Connected components over an undirected pair set by alternating
    * large-star / small-star rounds (Kiveris et al., "Connected Components
    * in MapReduce and Beyond", SoCC'14). Near-dup PAIRS are not a dedup
    * policy: if A~B and B~C, keeping "one of each pair" keeps two of the
    * three — the unit of deduplication is the transitive CLUSTER. The
    * reference has no equivalent (single-process); this is the operator a
    * 100 TB pipeline runs right after `minhashPairs`.
    *
    * Why star-contraction and not plain label propagation: propagation
    * needs O(diameter) rounds — a pathological chain (adversarial or
    * boilerplate-heavy corpora produce them) means thousands of shuffles.
    * Star rounds square away chains in O(log² n) worst case, 2–4 rounds on
    * real near-dup graphs (clusters are clique-ish). Every round moves only
    * 16-byte (u, v) edge rows through shuffles keyed on node id; min-
    * aggregation is map-side partial. `localCheckpoint` truncates the
    * lineage each round so the driver loop doesn't stack O(rounds) plans
    * (swap for `checkpoint` + a reliable dir on a real cluster where
    * executor loss must not force a full recompute).
    *
    * Convergence is detected by an (edge-count, xor of edge-hashes)
    * fingerprint going stable across a round — exact equality would cost a
    * join per round; the fingerprint is one slim aggregate (xor is
    * order-independent; a missed change needs a 64-bit xxhash64 multiset
    * collision). `maxIter` only guards the loop; hitting it throws rather
    * than silently returning a non-converged (non-star) edge set.
    *
    * Returns (id, root): one row per non-isolated node with root = min id
    * of its component. Isolated nodes (no pair) don't appear — [[clusters]]
    * re-attaches them. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    // The fingerprint rides the SAME pass that materializes the round's
    // checkpoint (r15 optimization, guide §2.4): observe() computes the
    // (count, xor) pair as accumulator metrics DURING the eager
    // localCheckpoint job, where the former separate `agg(...).head()`
    // action re-read the whole edge set per round — at 100 TB that
    // second read is a full extra pass per round, at bench scale it was
    // one extra stage-job per round. Values are identical by
    // construction (same aggregate expressions over the same rows).
    def checkpointWithFingerprint(e: DataFrame): (DataFrame, (Long, Long)) = {
      val observed = e.observe("cc_fp",
        count(lit(1)).as("n"),
        expr("cast(coalesce(bit_xor(xxhash64(u, v)), 0) as long)").as("x"))
      val cp = observed.localCheckpoint(true)
      val row = observed.queryExecution.observedMetrics.getOrElse("cc_fp",
        throw new IllegalStateException(
          "connectedComponents: observed fingerprint metrics missing"))
      (cp, (row.getLong(0), row.getLong(1)))
    }
    var (edges, fp) = checkpointWithFingerprint(pairs
      .select(greatest(col(aCol), col(bCol)).cast("long").as("u"),
        least(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // large-star: every node links its strictly-larger neighbors to the
      // minimum of its closed neighborhood — after this, every edge points
      // high → low. Output is NOT deduplicated: duplicates are bounded by
      // neighbor multiplicity, min-aggregation is insensitive to them, and
      // the round's single distinct at the small-star tail catches all —
      // one shuffle per round instead of two. The min tables are
      // node-count-sized; AQE broadcasts them while small, so each star
      // costs one groupBy exchange.
      val sym = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("__mn"))
        .select(col("u"), least(col("u"), col("__mn")).as("m"))
      val large = sym.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // small-star: every node links its (all-smaller) neighbors and itself
      // to its minimum neighbor.
      val mins2 = large.groupBy("u").agg(min("v").as("m"))
      val (next, fp2) = checkpointWithFingerprint(
        large.join(mins2, Seq("u"))
          .filter(col("v") =!= col("m"))
          .select(col("v").as("u"), col("m").as("v"))
          .unionByName(mins2.select(col("u"), col("m").as("v")))
          .distinct())
      converged = fp2 == fp
      fp = fp2
      if (sys.env.contains("GRAFT_CC_TRACE"))
        System.err.println(s"[cc] round ${it + 1}: edges=${fp2._1} t=${System.nanoTime() / 1000000}")
      // the fingerprint above materialized `next`'s checkpoint, so the
      // previous round's edge blocks are dead — free them now rather than
      // pinning O(rounds) edge sets until the ContextCleaner runs (the
      // supersede-free posture of [[graft.ops.Graphs.pageRank]]). The
      // FINAL checkpoint is the returned frame and stays.
      org.apache.spark.sql.GraftBridge.freeLocalCheckpoint(edges)
      edges = next
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    edges.select(col("u").as("id"), col("v").as("root"))
  }

  /** Cluster assignment for EVERY document: cluster_id = min doc id of its
    * duplicate component (singletons map to themselves), is_canonical marks
    * the one row per cluster a dedup pass keeps. The join back to the full
    * id set is a slim long-to-long left join; at scale the component map is
    * tiny relative to the corpus (only non-isolated nodes appear) so AQE
    * broadcasts it. */
  def clusters(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b", maxIter: Int = 25): DataFrame = {
    val roots = connectedComponents(pairs, aCol, bCol, maxIter)
      .select(col("id").as("__ccid"), col("root"))
    df.select(col(idCol).cast("long").as(idCol))
      .join(roots, col(idCol) === col("__ccid"), "left")
      .select(col(idCol), coalesce(col("root"), col(idCol)).as("cluster_id"))
      .withColumn("is_canonical", col(idCol) === col("cluster_id"))
  }

  /** Keep one document per duplicate cluster (the min-id canonical): the
    * full-width rows survive via a LEFT SEMI join on the slim canonical-id
    * set — document payloads never enter the clustering shuffles. */
  def dropDuplicateClusters(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val keep = clusters(df, idCol, pairs, aCol, bCol)
      .filter(col("is_canonical")).select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ---- paragraph-level exact dedup ----

  /** Sub-document exact dedup at paragraph granularity — the CCNet /
    * FineWeb "repeated boilerplate" scrub (Wenzek et al. 2020 dedup at the
    * paragraph level; Penedo et al. 2024 drop repeated lines): every
    * distinct paragraph survives exactly ONCE corpus-wide, in its first
    * occurrence by ascending (doc id, paragraph index); later copies —
    * navigation chrome, cookie banners, license footers — are cut out and
    * the documents re-joined from their surviving paragraphs.
    *
    * Output: (idCol, text_dedup, n_paras, n_kept). `n_kept = 0` means every
    * paragraph was seen earlier (text_dedup = ''); callers drop those rows.
    *
    * Scale shape, three bounded shuffles and the text moves only where it
    * must:
    *  1. winner election groups sha2(paragraph) keys carrying only a
    *     (doc, idx) struct — 32-byte keys + 12-byte payloads, never text;
    *  2. the kept set joins back to the exploded paragraphs on the SAME
    *     (hash, doc, idx) key (AQE plans it; the winner side is one row per
    *     distinct paragraph);
    *  3. reassembly groups by doc id — each paragraph's text crosses the
    *     wire once, exactly like any doc-keyed repartition of the corpus.
    * The winner rule min(struct(doc, idx)) is a plain mergeable aggregate —
    * map-side partials, no window over the paragraph key space. */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n\n"): DataFrame = {
    val sepLit = lit(sep)
    val paras = df
      .select(col(idCol).cast("long").as("__doc"), col(textCol))
      .select(col("__doc"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as(Seq("__idx", "__para")))
      .withColumn("__ph", sha2(col("__para"), 256))
    // winner columns are RE-ALIASED (fresh exprIds): winners derives from
    // paras, and a groupBy key passes its attribute through, so joining on
    // __ph === __ph would be the same-exprId trivially-true-condition
    // hazard PlanSpec hunts for (SPARK-25150 class)
    val winners = paras
      .groupBy("__ph")
      .agg(min(struct(col("__doc"), col("__idx"))).as("__w"))
      .select(col("__ph").as("__wph"),
        col("__w.__doc").as("__wdoc"), col("__w.__idx").as("__widx"))
    val kept = paras.join(winners,
      col("__ph") === col("__wph") &&
        col("__doc") === col("__wdoc") && col("__idx") === col("__widx"))
      .select(col("__doc"), col("__idx"), col("__para"))
    val rebuilt = kept
      .groupBy(col("__doc"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("__idx"), col("__para")))),
          x => x("__para")), sep).as("text_dedup"),
        count(lit(1)).as("n_kept"))
    df.select(col(idCol).cast("long").as(idCol),
        size(split(col(textCol), java.util.regex.Pattern.quote(sep))).cast("long").as("n_paras"))
      .join(rebuilt, col(idCol) === col("__doc"), "left")
      .select(col(idCol),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }
}
