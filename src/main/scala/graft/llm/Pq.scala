package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) — the memory-compression scale path for
  * ANN, complementing [[Ivf]] (which prunes WHAT is scanned; PQ shrinks
  * what each scanned vector COSTS). A d-dim vector becomes M sub-codebook
  * codes (here M bytes): at 100 TB the float32 embedding column is the
  * dataset, and 64 floats → 8 codes is a 32× shrink that turns an
  * exhaustive ADC scan into a cache-resident table walk. Compose with
  * [[Ivf]] (IVF-PQ) by encoding per list and probing as usual.
  *
  *  1. train: per-subspace Lloyd on integer-quantized sub-vectors
  *     (floor(v·2^20) — exact IEEE, the [[Ivf]] trick), all M subspaces
  *     trained in ONE pass per iteration: the assignment kernel emits
  *     (subspace, code) keyed partial sums that collapse map-side to
  *     ≤ M·ksub rows per task;
  *  2. encode: map-side argmin against the broadcast codebook (M·ksub
  *     rows) — zero shuffle, like [[Ivf.index]]'s assignment;
  *  3. search: asymmetric distance computation — each query precomputes an
  *     M×ksub inner-product lookup table against the codebook, and every
  *     corpus row scores as M table lookups, never touching floats.
  *
  * Distances are L2 over (sub-vector − centroid MEAN); means are one
  * double division of exact integers, so every arithmetic step is
  * IEEE-deterministic and the DuckDB oracle (q_ann_pq) replays training,
  * encoding, and ADC ranking bit-for-bit. ADC ranks by approximate
  * COSINE: ip(q, x̂) / (|q|·|x̂|) with x̂ the reconstruction — consistent
  * with the cosine metric everywhere else in this engine.
  */
object Pq {

  private val Q = 1048576.0 // 2^20: floor(v·Q) is exact for float inputs

  /** Codebook row: (m, code, csum: element-wise integer sum, cnt). The
    * centroid is csum/cnt, derived identically everywhere it's used. */
  private val codebookSchema = StructType(Seq(
    StructField("m", LongType, nullable = false),
    StructField("code", LongType, nullable = false),
    StructField("csum", ArrayType(LongType), nullable = true),
    StructField("cnt", LongType, nullable = false)))

  /** floor(v·2^20) per component; null → empty. NaN components floor to 0
    * via Long truncation — deterministic. The ONE quantization kernel: the
    * driver-side LUT path, the executor-side LUT path, and `quantized` all
    * call this, so the bit contract with the oracle lives here. */
  private def quantize(e: scala.collection.Seq[Float]): Array[Long] = {
    if (e == null) return Array.emptyLongArray
    val q = new Array[Long](e.length)
    var i = 0
    while (i < e.length) { q(i) = math.floor(e(i).toDouble * Q).toLong; i += 1 }
    q
  }

  /** Zero-padded sub-vector copy of length dsub starting at `from` — short
    * vectors (the null-embedding path) read missing dims as 0, so every
    * emitted sub-vector has length exactly dsub and the element-wise sum
    * aggregator never sees ragged arrays. */
  private def subVec(qe: Array[Long], from: Int, dsub: Int): Array[Long] = {
    val out = new Array[Long](dsub)
    var i = 0
    while (i < dsub && from + i < qe.length) { out(i) = qe(from + i); i += 1 }
    out
  }

  /** (vec_id, qe: floor(v·2^20), h: splitmix64(vec_id)) — one typed pass.
    * A null embedding quantizes to an empty vector (codes degenerate to the
    * all-zero sub-vector's argmin — deterministic, no NPE mid-job; same
    * posture as Ivf.assign's null path). */
  private def quantized(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("vec_id").cast("long"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, e) => (id, quantize(e), Hashing.splitmix64(id)) })
      .toDF("vec_id", "qe", "__h")
  }

  /** Driver-side codebook: means(m)(code) as doubles + (csum, cnt) rows,
    * dense by (m, code). */
  private final case class Book(m: Int, ksub: Int, dsub: Int,
      csum: Array[Array[Long]], cnt: Array[Long]) {
    // mean = csum/cnt, the ONE place the division happens (both the
    // assignment distance and the ADC tables read these doubles)
    val means: Array[Array[Double]] = csum.zipWithIndex.map { case (s, i) =>
      val c = cnt(i).toDouble
      s.map(_.toDouble / c)
    }
    def mean(mi: Int, code: Int): Array[Double] = means(mi * ksub + code)
  }

  private def collectBook(codebook: DataFrame, m: Int, ksub: Int): Book = {
    val rows = codebook.select(col("m").cast("long"), col("code").cast("long"),
        col("csum"), col("cnt").cast("long"))
      .collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt),
        (r.getAs[scala.collection.Seq[Long]](2).toArray, r.getLong(3))))
      .toMap
    // empty is legal: training on a zero-row corpus yields a zero-entry
    // codebook, and a zero-subspace Book encodes every vector to zero
    // codes / scores nothing — the coherent no-model extension
    // (EmptyInputSpec). A PARTIAL book is still a hard error.
    if (rows.isEmpty) return Book(0, ksub, 0, Array.empty, Array.empty)
    require(rows.size == m * ksub, s"codebook has ${rows.size} entries, want ${m * ksub}")
    val dsub = rows.head._2._1.length
    val csum = Array.tabulate(m * ksub)(i => rows((i / ksub, i % ksub))._1)
    val cnt = Array.tabulate(m * ksub)(i => rows((i / ksub, i % ksub))._2)
    Book(m, ksub, dsub, csum, cnt)
  }

  /** Squared L2 distance of an integer sub-vector to a mean, ascending-dim
    * double fold — the bit-contract shared with the oracle. Short vectors
    * (the null-embedding path) read missing dims as 0. */
  private def l2(sq: Array[Long], from: Int, mean: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < mean.length) {
      val v = if (from + i < sq.length) sq(from + i).toDouble else 0.0
      val d = v - mean(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Per-subspace argmin code for one full quantized vector (ties to the
    * lowest code). */
  private def assignCodes(qe: Array[Long], book: Book): Array[Long] = {
    val codes = new Array[Long](book.m)
    var mi = 0
    while (mi < book.m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.ksub) {
        val d = l2(qe, mi * book.dsub, book.mean(mi, c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(mi) = best.toLong
      mi += 1
    }
    codes
  }

  /** Train an M×ksub codebook with `iters` Lloyd iterations over `df`
    * (vec_id: long, embedding: array<float>, dim divisible by m). Seeds are
    * the ksub hash-smallest vectors (splitmix64(vec_id) — deterministic,
    * no RNG), sliced per subspace; empty codes keep their previous
    * (csum, cnt). Each iteration is ONE corpus pass: the typed kernel emits
    * (m·ksub+code, sub-vector) rows whose partial aggregation collapses to
    * ≤ M·ksub rows per map task before the (tiny) shuffle. */
  def train(df: DataFrame, m: Int, ksub: Int, iters: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val quant = quantized(df).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // dim = the LONGEST quantized vector, not head()'s: a null embedding is
    // an empty qe, and letting it pick dim would silently train an empty
    // codebook (and a real vector's sums would then overrun the null row's
    // zero-length slices mid-aggregation).
    val dimRow = quant.select(max(size(col("qe"))).as("d")).head()
    // max over zero rows is NULL: an empty corpus trains the empty
    // codebook (not an error — see collectBook's empty contract)
    if (dimRow.isNullAt(0)) {
      quant.unpersist(blocking = false)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], codebookSchema)
    }
    val dim = dimRow.getInt(0)
    require(dim > 0, "all embeddings empty/null — nothing to train on")
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val seedRows = quant.select("__h", "qe").orderBy("__h").limit(ksub).collect()
      .zipWithIndex.flatMap { case (r, j) =>
        val qe = r.getAs[scala.collection.Seq[Long]](1).toArray
        (0 until m).map(mi =>
          Row(mi.toLong, j.toLong, subVec(qe, mi * dsub, dsub).toSeq, 1L))
      }
    var codebook: DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(seedRows: _*), codebookSchema)
    var it = 0
    while (it < iters) {
      val book = collectBook(codebook, m, ksub)
      val bc = spark.sparkContext.broadcast(book)
      // one pass: (m·ksub + code) → sub-vector rows, partially aggregated
      val sums = quant.select(col("vec_id"), col("qe")).as[(Long, Array[Long])]
        .flatMap { case (_, qe) =>
          val b = bc.value
          val codes = assignCodes(qe, b)
          (0 until b.m).iterator.map { mi =>
            (mi.toLong * b.ksub + codes(mi), subVec(qe, mi * b.dsub, b.dsub))
          }
        }
        .groupByKey(_._1)
        .agg(SumSubVec.toColumn.name("csum"), count(lit(1)).as[Long].name("cnt"))
        .toDF("key", "csum", "cnt")
        .select(expr(s"key div $ksub").as("m"),
          (col("key") % ksub).as("code"), col("csum"), col("cnt"))
      // Lloyd empty-code handling: keep the previous (csum, cnt) pair
      val reseeded = codebook.select(col("m"), col("code"),
          col("csum").as("__ps"), col("cnt").as("__pc"))
        .join(sums, Seq("m", "code"), "left")
        .select(col("m"), col("code"),
          coalesce(col("csum"), col("__ps")).as("csum"),
          coalesce(col("cnt"), col("__pc")).as("cnt"))
      codebook = spark.createDataFrame(
        java.util.Arrays.asList(reseeded.collect(): _*), codebookSchema)
      it += 1
    }
    quant.unpersist(blocking = false)
    codebook
  }

  private object SumSubVec extends org.apache.spark.sql.expressions.Aggregator[
      (Long, Array[Long]), Array[Long], Array[Long]] {
    // `subVec` guarantees every input has length dsub, so the ragged branch
    // is unreachable today — kept total anyway (sum into the longer buffer)
    // so a future caller can't turn a length mismatch into an out-of-bounds.
    private def add(b: Array[Long], a: Array[Long]): Array[Long] =
      if (b.isEmpty) a.clone()
      else if (a.length <= b.length) { var i = 0; while (i < a.length) { b(i) += a(i); i += 1 }; b }
      else { val out = a.clone(); var i = 0; while (i < b.length) { out(i) += b(i); i += 1 }; out }
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], a: (Long, Array[Long])): Array[Long] = add(b, a._2)
    def merge(x: Array[Long], y: Array[Long]): Array[Long] =
      if (x.isEmpty) y else add(x, y)
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Encode the corpus: (vec_id, codes: array<long> of length M). Map-side
    * argmin against the broadcast codebook — zero shuffle; at rest this is
    * the 32×-smaller column a 100 TB index stores alongside (or instead
    * of) the floats. */
  def encode(df: DataFrame, codebook: DataFrame, m: Int, ksub: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(collectBook(codebook, m, ksub))
    quantized(df).select(col("vec_id"), col("qe")).as[(Long, Array[Long])]
      .mapPartitions { rows =>
        val b = bc.value
        rows.map { case (id, qe) => (id, assignCodes(qe, b)) }
      }
      .toDF("vec_id", "codes")
  }

  /** ADC top-k: each query precomputes (ip, |centroid|²) tables against the
    * broadcast codebook; every encoded corpus row scores as M lookups —
    * adc_cosine = Σ_m ip(q_m, c_m) / (|q| · sqrt(Σ_m |c_m|²)), the cosine
    * of the query against the RECONSTRUCTION. Few-queries regime (queries
    * broadcast with the tables); rank by (adc DESC, nn_id) per query.
    * Output: (q_id, nn_id, adc, rank ≤ k). */
  /** One query's ADC tables from its quantized vector and the codebook:
    * (|q|, ips(m·ksub+code) = ip of q's sub-vector with the centroid mean,
    * cn2(m·ksub+code) = centroid mean squared norm) — all ascending-index
    * double folds (the oracle contract). Called on the DRIVER by
    * [[buildLuts]] (few-queries regime) and PER TASK by [[searchIvfAdcAgg]]
    * (many-queries regime) — same kernel, bit-identical tables. */
  private def lutFor(qe: Array[Long], book: Book): (Double, Array[Double], Array[Double]) = {
    var nq = 0.0
    var i = 0
    while (i < qe.length) { val v = qe(i).toDouble; nq += v * v; i += 1 }
    val ips = new Array[Double](book.m * book.ksub)
    val cn2 = new Array[Double](book.m * book.ksub)
    var mi = 0
    while (mi < book.m) {
      var c = 0
      while (c < book.ksub) {
        val mean = book.mean(mi, c)
        var ip = 0.0
        var n2 = 0.0
        var d = 0
        while (d < mean.length) {
          val idx = mi * book.dsub + d
          val qd = if (idx < qe.length) qe(idx).toDouble else 0.0
          ip += qd * mean(d)
          n2 += mean(d) * mean(d)
          d += 1
        }
        ips(mi * book.ksub + c) = ip
        cn2(mi * book.ksub + c) = n2
        c += 1
      }
      mi += 1
    }
    (math.sqrt(nq), ips, cn2)
  }

  /** Driver-side per-query ADC tables — the FEW-queries regime (the whole
    * query set lands here and broadcasts as |q|·M·ksub·2 doubles). The
    * many-queries paths ([[searchIvfAdcAgg]]) never call this: they build
    * the same tables per task from the broadcast codebook. */
  private def buildLuts(queries: DataFrame,
      book: Book): Array[(Long, Double, Array[Double], Array[Double])] = {
    val spark = queries.sparkSession
    import spark.implicits._
    quantized(queries).select(col("vec_id"), col("qe"))
      .as[(Long, Array[Long])].collect().sortBy(_._1)
      .map { case (qid, qe) =>
        val (nq, ips, cn2) = lutFor(qe, book)
        (qid, nq, ips, cn2)
      }
  }

  /** (q_id, nn_id, adc) for every (query, corpus) pair — the exhaustive
    * ADC scan as a broadcast-LUT map stage. */
  private def adcScores(encoded: DataFrame, codebook: DataFrame,
      queries: DataFrame, m: Int, ksub: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val book = collectBook(codebook, m, ksub)
    val bq = spark.sparkContext.broadcast(buildLuts(queries, book))
    val ksubL = ksub
    encoded.select(col("vec_id"), col("codes")).as[(Long, Array[Long])]
      .mapPartitions { rows =>
        val qs = bq.value
        rows.flatMap { case (id, codes) =>
          qs.iterator.filter(_._1 != id).map { case (qid, nq, ips, cn2) =>
            (qid, id, adcScore(codes, ksubL, nq, ips, cn2))
          }
        }
      }
      .toDF("q_id", "nn_id", "adc")
  }

  def searchAdc(encoded: DataFrame, codebook: DataFrame, queries: DataFrame,
      m: Int, ksub: Int, k: Int): DataFrame =
    adcScores(encoded, codebook, queries, m, ksub)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("adc").desc, col("nn_id"))))
      .filter(col("rank") <= k)

  /** Many-queries ADC ranking: identical scores to [[searchAdc]], ranked
    * by the bounded top-k Aggregator ([[Ann.topKPerQuery]]) instead of a
    * per-q_id window — parallelism is never |queries|-bounded and no stage
    * materializes all candidates of a query before ranking. Row-identical
    * to [[searchAdc]] (LlmSpec). */
  def searchAdcAgg(encoded: DataFrame, codebook: DataFrame, queries: DataFrame,
      m: Int, ksub: Int, k: Int): DataFrame =
    Ann.topKPerQuery(
        adcScores(encoded, codebook, queries, m, ksub)
          .withColumnRenamed("adc", "cosine"), k)
      .withColumnRenamed("cosine", "adc")
      .select("q_id", "nn_id", "adc", "rank") // same column ORDER as searchAdc

  /** IVF-PQ — the standard large-scale ANN architecture (faiss's IVFPQ,
    * Jégou et al. §V): IVF lists prune WHAT is scanned (nprobe/k of the
    * corpus), PQ codes shrink what each candidate COSTS (M table lookups).
    * `encodedLists` is the at-rest index: (vec_id, list_id, codes) from
    * [[Ivf.index]] joined with [[encode]] — on disk, partitionBy(list_id)
    * so a probe reads only its lists. Probing is [[Ivf.nprobeAssign]]'s
    * map-side kernel (no query-set broadcast, no window over k); the
    * candidate join shuffles on list_id; scoring is the same broadcast-LUT
    * map stage as [[searchAdc]]. Few-queries regime for the LUT broadcast
    * (|q|·M·ksub doubles) — for huge query sets use [[searchIvfAdcAgg]],
    * which builds the same tables per task and is never |queries|-bounded.
    * Output: (q_id, nn_id, adc, rank ≤ k). */
  def searchIvfAdc(encodedLists: DataFrame, ivfCentroids: DataFrame,
      codebook: DataFrame, queries: DataFrame, m: Int, ksub: Int, k: Int,
      nprobe: Int): DataFrame = {
    val spark = encodedLists.sparkSession
    import spark.implicits._
    val book = collectBook(codebook, m, ksub)
    val lutMap = buildLuts(queries, book).map(l => l._1 -> l).toMap
    val bq = spark.sparkContext.broadcast(lutMap)
    val probe = Ivf.nprobeAssign(queries, ivfCentroids, nprobe)
      .select(col("q_id"), col("list_id"))
    val ksubL = ksub
    val scored = encodedLists.join(probe, Seq("list_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("nn_id"), col("codes"))
      .as[(Long, Long, Array[Long])]
      .mapPartitions { rows =>
        val qs = bq.value
        rows.map { case (qid, nn, codes) =>
          val (_, nq, ips, cn2) = qs(qid)
          (qid, nn, adcScore(codes, ksubL, nq, ips, cn2))
        }
      }
      .toDF("q_id", "nn_id", "adc")
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("adc").desc, col("nn_id"))))
      .filter(col("rank") <= k)
  }

  /** Persist the IVF-PQ at-rest index: (vec_id, codes, list_id) written
    * `partitionBy(list_id)`, so each probed list is its own parquet
    * directory and a probe's `list_id IN (...)` filter becomes PARTITION
    * PRUNING — a nprobe/k probe physically reads nprobe/k of the index,
    * the property that makes IVF the 100 TB ANN architecture (LlmSpec
    * asserts the pruned scan). 32× smaller than the float column at rest
    * (codes only; keep embeddings elsewhere if re-ranking needs them). */
  def writeIndex(encodedLists: DataFrame, path: String): Unit =
    encodedLists.select(col("vec_id"), col("codes"), col("list_id"))
      .write.partitionBy("list_id").mode("overwrite").parquet(path)

  /** Read the at-rest index back; `list_id` returns as a partition column
    * usable for pruning filters. The schema is pinned explicitly so the
    * partition column keeps its written LongType (inference would narrow
    * it to int and type-mismatch joins against fresh assignments). */
  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.schema(StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("codes", ArrayType(LongType), nullable = true),
        StructField("list_id", LongType, nullable = false))))
      .parquet(path)

  /** ADC cosine of one encoded row against one query's tables: M lookups,
    * rn2 accumulated in subspace order — shared by every scoring path. */
  private def adcScore(codes: Array[Long], ksub: Int, nq: Double,
      ips: Array[Double], cn2: Array[Double]): Double = {
    var adc = 0.0
    var rn2 = 0.0
    var mi = 0
    while (mi < codes.length) {
      val slot = mi * ksub + codes(mi).toInt
      adc += ips(slot)
      rn2 += cn2(slot)
      mi += 1
    }
    val denom = nq * math.sqrt(rn2)
    if (denom == 0.0) 0.0 else adc / denom
  }

  /** IVF-PQ for LARGE query sets — the 100 TB form of [[searchIvfAdc]]:
    * NOTHING is |queries|-bounded. The query set is never collected to the
    * driver and never broadcast; the only broadcast is the codebook
    * (M·ksub rows). Probing is [[Ivf.nprobeAssign]]'s map-side kernel,
    * which carries each query's raw embedding through its nprobe slim rows;
    * the candidate join shuffles on list_id; each task then sorts its
    * partition by q_id (local sort, no exchange) and builds ONE M×ksub ADC
    * table at a time via [[lutFor]] — the same kernel [[buildLuts]] runs on
    * the driver, so scores are bit-identical to [[searchIvfAdc]] (LlmSpec
    * asserts row-identity). Ranking is the bounded top-k Aggregator
    * ([[Ann.topKPerQuery]]), never a per-q_id window. Per-task memory:
    * one LUT (2·M·ksub doubles) regardless of |queries|.
    * Output: (q_id, nn_id, adc, rank ≤ k) — same order as [[searchIvfAdc]]. */
  def searchIvfAdcAgg(encodedLists: DataFrame, ivfCentroids: DataFrame,
      codebook: DataFrame, queries: DataFrame, m: Int, ksub: Int, k: Int,
      nprobe: Int): DataFrame = {
    val spark = encodedLists.sparkSession
    import spark.implicits._
    val bb = spark.sparkContext.broadcast(collectBook(codebook, m, ksub))
    val probe = Ivf.nprobeAssign(queries, ivfCentroids, nprobe) // (q_id, __e_q, list_id)
    val ksubL = ksub
    val scored = encodedLists.join(probe, Seq("list_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("__e_q"), col("vec_id").as("nn_id"), col("codes"))
      .sortWithinPartitions("q_id") // group same-query rows so each task holds ONE LUT
      .as[(Long, Array[Float], Long, Array[Long])]
      .mapPartitions { rows =>
        val b = bb.value
        var curQ = Long.MinValue
        var hasLut = false
        var nq = 0.0
        var ips: Array[Double] = null
        var cn2: Array[Double] = null
        rows.map { case (qid, e, nn, codes) =>
          if (!hasLut || qid != curQ) {
            val lut = lutFor(quantize(e), b)
            nq = lut._1; ips = lut._2; cn2 = lut._3
            curQ = qid; hasLut = true
          }
          (qid, nn, adcScore(codes, ksubL, nq, ips, cn2))
        }
      }
      .toDF("q_id", "nn_id", "cosine")
    Ann.topKPerQuery(scored, k)
      .withColumnRenamed("cosine", "adc")
      .select("q_id", "nn_id", "adc", "rank")
  }
}
