package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}
import graft.functions.Exprs

/** IVF (inverted-file) ANN — the coarse-quantizer scale path, complementing
  * the hyperplane-LSH variant in [[Ann]]:
  *
  *  1. train: k centroids by Lloyd iterations over the corpus — each
  *     iteration is ONE broadcast-join assignment pass + ONE groupBy
  *     average (no driver-side k-means); initial centroids are a
  *     deterministic hash-spread sample, not RNG;
  *  2. index: every vector assigned to its nearest centroid (list id) —
  *     at rest this is a `partitionBy(list_id)` layout, so a probe reads
  *     only nprobe/k of the corpus;
  *  3. search: queries pick their `nprobe` nearest centroids (centroid
  *     table is k rows — broadcast), then join candidates on list id and
  *     cosine-verify top-k.
  *
  * Shuffle profile: training shuffles (vector, assignment) by list id per
  * iteration; search joins on list id with the query side broadcast. The
  * corpus is never self-joined. Recall grows with nprobe; measured against
  * the brute-force baseline in LlmSpec.
  */
object Ivf {

  /** Quantization scale: 2^20. floor(v · 2^20) is EXACT IEEE arithmetic
    * (power-of-two multiply + floor), so every engine that replays it gets
    * the same integers — the foundation of the cross-engine oracle. */
  private val Q = 1048576.0

  /** (vec_id, embedding, __q, __h): integer-quantized embedding plus the
    * splitmix64 seed hash, one typed pass. Quantization makes the Lloyd
    * state integer-exact; cosine is scale-invariant so clustering quality
    * is unchanged (relative error ~1e-6). */
  private def withQuantized(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("vec_id").cast("long"), col("embedding").cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, e) =>
        val q = new Array[Long](e.length)
        var i = 0
        while (i < e.length) { q(i) = math.floor(e(i).toDouble * Q).toLong; i += 1 }
        (id, e, q, Hashing.splitmix64(id))
      })
      .toDF("vec_id", "embedding", "__q", "__h")
  }

  /** Element-wise integer sum of quantized vectors, as a typed Aggregator:
    * partial aggregation collapses each map task to ≤k local sums, so the
    * exchange carries k rows per partition — not the N×d (id, dim, v) blowup
    * a posexplode + groupBy(dim) shape would shuffle every Lloyd iteration.
    * Sums, not means: cosine assignment is scale-invariant, and integer
    * sums are order-independent — bit-identical across engines and cluster
    * sizes, where a floating mean depends on reduction order. */
  private object SumVec extends org.apache.spark.sql.expressions.Aggregator[
      (Long, Array[Long]), Array[Long], Array[Long]] {
    private def add(b: Array[Long], a: Array[Long]): Array[Long] =
      if (b.isEmpty) a.clone()
      else { var i = 0; while (i < b.length) { b(i) += a(i); i += 1 }; b }
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

  private def sumVectors(assigned: DataFrame): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    assigned.select(col("list_id").cast("long"), col("__q"))
      .as[(Long, Array[Long])]
      .groupByKey(_._1)
      .agg(SumVec.toColumn.name("centroid"))
      .toDF("list_id", "centroid")
  }

  /** Cosine of one float query vector against every broadcast centroid, in
    * centroid-array order — the ONE kernel behind both assignment paths
    * (argmax in [[assign]], top-np in `nprobeAssign`), so the bit-exact
    * contract with [[graft.functions.CosineSimilarity]] lives in a single
    * place: sequential double fold over float inputs, min-length dot,
    * sqrt(nx)*sqrt(ny) denominator, zero-norm → 0.0. A NaN input component
    * yields NaN sims, normalized to +∞ so selection matches Spark's
    * NaN-sorts-largest `orderBy(desc)` the window forms used (ties still
    * break to the lowest list id downstream). */
  private def centroidSims(e: scala.collection.Seq[Float],
      cs: Array[(Long, Array[Double], Double)]): Array[Double] = {
    val n = e.length
    val x = new Array[Double](n)
    var nx = 0.0
    var i = 0
    while (i < n) { x(i) = e(i).toDouble; nx += x(i) * x(i); i += 1 }
    val sims = new Array[Double](cs.length)
    var c = 0
    while (c < cs.length) {
      val (_, v, ny) = cs(c)
      val d = math.min(n, v.length)
      var dot = 0.0
      var j = 0
      while (j < d) { dot += x(j) * v(j); j += 1 }
      val s = if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
      sims(c) = if (java.lang.Double.isNaN(s)) Double.PositiveInfinity else s
      c += 1
    }
    sims
  }

  /** Centroids pulled to the driver for broadcast: (list_id, values as
    * double, precomputed squared norm), ascending list_id. The long→float
    * cast happens at the Spark layer so the conversion chain is identical
    * to `Exprs.cosine(_, centroid)` (long → float → double). k rows only. */
  private def collectCentroids(centroids: DataFrame): Array[(Long, Array[Double], Double)] = {
    val spark = centroids.sparkSession
    import spark.implicits._
    val cents = centroids
      .select(col("list_id").cast("long"), col("centroid").cast("array<float>"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .map { case (id, c) =>
        val v = new Array[Double](c.length)
        var ny = 0.0
        var i = 0
        while (i < c.length) { v(i) = c(i).toDouble; ny += v(i) * v(i); i += 1 }
        (id, v, ny)
      }
    // empty is legal: training on a zero-row corpus yields zero centroids,
    // and every consumer treats "no lists exist" as "no assignments/hits"
    // (the coherent extension — see EmptyInputSpec). Callers must not
    // index past cents.length.
    cents
  }

  /** Nearest-centroid assignment as a MAP-SIDE argmax: centroids are k rows,
    * collected and broadcast, and each corpus row scans them in one typed
    * projection — zero shuffle, no k× row blowup, no per-key window sort.
    * (The previous crossJoin + row_number form shuffled k× the corpus per
    * Lloyd iteration — a scale-killer at k=4096.) Arithmetic replicates
    * [[graft.functions.CosineSimilarity]] exactly: sequential double fold
    * over float inputs, sqrt(nx)*sqrt(ny) denominator, zero-norm → 0.0 —
    * so assignments are bit-identical to the old plan and the oracle.
    * Ties break to the lowest list_id (strict `>` over ascending ids),
    * matching the old `orderBy(sim desc, list_id)`. All input columns pass
    * through with `list_id` appended. */
  private def assign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = collectCentroids(centroids)
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(cents)
    val in = corpus.withColumn("embedding", col("embedding").cast("array<float>"))
    val outSchema = in.schema.add("list_id", LongType, nullable = false)
    // no lists → no assignments (empty-corpus training); never cs(0)
    if (cents.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    val embIdx = in.schema.fieldIndex("embedding")
    in.mapPartitions { rows =>
      val cs = bc.value
      rows.map { row =>
        val e = row.getAs[scala.collection.Seq[Float]](embIdx)
        // null embedding → deterministic lowest list id (all sims degenerate
        // to 0 anyway: same as the zero-vector path, no NPE mid-job)
        if (e == null) Row.fromSeq(row.toSeq :+ cs(0)._1)
        else {
        val sims = centroidSims(e, cs)
        var bestId = cs(0)._1
        var bestSim = Double.NegativeInfinity
        var c = 0
        while (c < cs.length) {
          if (sims(c) > bestSim) { bestSim = sims(c); bestId = cs(c)._1 }
          c += 1
        }
        Row.fromSeq(row.toSeq :+ bestId)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Train k centroids with `iters` Lloyd iterations. `df` needs
    * (vec_id: long, embedding: array<float>). Centroids are integer
    * vectors (quantized sums — scale irrelevant under cosine). */
  def train(df: DataFrame, k: Int, iters: Int = 3): DataFrame = {
    // deterministic seed: the k hash-smallest vectors by splitmix64(vec_id)
    // — a TakeOrdered (top-k per partition + k-way merge), never a global
    // sort. The k winners land on the driver (same place every Lloyd step
    // already puts the k-row centroid table) and are numbered there — no
    // single-partition row_number window, one less exchange.
    // one materialization feeds every Lloyd pass (seed + iters assignments)
    val quant = withQuantized(df)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spark = df.sparkSession
    val centroidSchema = StructType(Seq(
      StructField("list_id", LongType, nullable = false),
      StructField("centroid", ArrayType(LongType), nullable = true)))
    val seed = quant.select("__h", "__q").orderBy("__h").limit(k).collect()
      .zipWithIndex.map { case (r, i) => Row(i.toLong, r.get(1)) }
    var centroids: DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(seed: _*), centroidSchema)
    var i = 0
    while (i < iters) {
      val next = sumVectors(
        assign(quant.select("vec_id", "embedding", "__q"), centroids)
          .select("list_id", "__q"))
      // standard Lloyd empty-cluster handling: a list that won no points
      // keeps its previous centroid instead of silently vanishing
      val reseeded = centroids.select(col("list_id"), col("centroid").as("__prev"))
        .join(next, Seq("list_id"), "left")
        .select(col("list_id"), coalesce(col("centroid"), col("__prev")).as("centroid"))
      // materialize the (tiny, k-row) centroid table per iteration so each
      // Lloyd step is a single pass over the corpus, not a growing plan
      val rows = java.util.Arrays.asList(reseeded.collect(): _*)
      centroids = reseeded.sparkSession.createDataFrame(rows, reseeded.schema)
      i += 1
    }
    quant.unpersist(blocking = false)
    centroids
  }

  /** Index: (vec_id, embedding, list_id). Write with partitionBy("list_id")
    * for probe-local reads at rest. */
  def index(df: DataFrame, centroids: DataFrame): DataFrame =
    assign(df.select("vec_id", "embedding"), centroids)

  /** Scored probe candidates: each query joins only its `nprobe` nearest
    * lists (centroid table = k rows, broadcast both ways). The per-query
    * nprobe pick is a window over k rows per query — bounded by k, not by
    * the corpus. Output: (q_id, nn_id, cosine). */
  private def probeCandidates(indexed: DataFrame, centroids: DataFrame,
      queries: DataFrame, nprobe: Int): DataFrame = {
    val qLists = queries.select(col("vec_id").as("q_id"), col("embedding").as("__e_q"))
      .crossJoin(broadcast(centroids))
      .withColumn("__sim", Exprs.cosine(col("__e_q"), col("centroid")))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("__sim").desc, col("list_id"))))
      .filter(col("__rk") <= nprobe)
      .select("q_id", "__e_q", "list_id")
    indexed.select(col("list_id"), col("vec_id").as("nn_id"), col("embedding").as("__e_c"))
      .join(broadcast(qLists), Seq("list_id"))
      .filter(col("q_id") =!= col("nn_id"))
      .withColumn("cosine", Exprs.cosine(col("__e_q"), col("__e_c")))
      .select("q_id", "nn_id", "cosine")
  }

  /** Search: top-k by cosine among the nprobe nearest lists per query.
    * Window-ranked — the few-queries regime (see [[searchAgg]]). */
  def search(indexed: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int = 4): DataFrame =
    probeCandidates(indexed, centroids, queries, nprobe)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("cosine").desc, col("nn_id"))))
      .filter(col("rank") <= k)
      .select("q_id", "nn_id", "rank", "cosine")

  /** Map-side nprobe assignment for LARGE query sets: each query row picks
    * its nprobe nearest lists against the driver-collected broadcast
    * centroid array and emits nprobe slim rows — no broadcast of the query
    * set, no window. Arithmetic and tie order ((sim desc, list_id asc);
    * identical cosine chain) match the window form exactly, so the two
    * probe paths choose the same lists. A null embedding deterministically
    * probes the first nprobe lists — the same lists the window form's
    * nulls-last ordering degenerates to. */
  private[llm] def nprobeAssign(queries: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    val cents = collectCentroids(centroids)
    val spark = queries.sparkSession
    val bc = spark.sparkContext.broadcast(cents)
    val in = queries.select(col("vec_id").cast("long").as("q_id"),
      col("embedding").cast("array<float>").as("__e_q"))
    val outSchema = in.schema.add("list_id", LongType, nullable = false)
    in.mapPartitions { rows =>
      val cs = bc.value
      val np = math.min(nprobe, cs.length)
      rows.flatMap { row =>
        val e = row.getAs[scala.collection.Seq[Float]](1)
        if (e == null) (0 until np).map(ci => Row(row.get(0), null, cs(ci)._1))
        else {
          val sims = centroidSims(e, cs)
          // top-np selection, ties to the lowest list id: strict > over
          // ascending ids, np passes of O(k) — np and k are both small.
          // sims are never NaN (centroidSims normalizes to +∞), so >= -∞
          // always selects SOMETHING; the -1 guard is belt-and-braces
          val taken = new Array[Boolean](cs.length)
          (0 until np).map { _ =>
            var best = -1
            var bestSim = Double.NegativeInfinity
            var ci = 0
            while (ci < cs.length) {
              if (!taken(ci) && (best == -1 || sims(ci) > bestSim)) { best = ci; bestSim = sims(ci) }
              ci += 1
            }
            taken(best) = true
            Row(row.get(0), row.get(1), cs(best)._1)
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Search for LARGE query sets: map-side nprobe assignment (no query-set
    * broadcast, no window) → shuffled equi-join on list_id → bounded top-k
    * aggregation ([[Ann.topKPerQuery]]). Row-identical to [[search]]
    * (LlmSpec); no stage is |queries|-bounded: probing is a map, the
    * candidate join shuffles on list_id, ranking keeps ≤k state per task.
    * A hot list (many queries probing it) is an AQE skew-split case, not a
    * planning hazard. */
  def searchAgg(indexed: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int = 4): DataFrame = {
    val qProbe = nprobeAssign(queries, centroids, nprobe)
    val cand = indexed
      .select(col("list_id"), col("vec_id").as("nn_id"), col("embedding").as("__e_c"))
      .join(qProbe, Seq("list_id"))
      .filter(col("q_id") =!= col("nn_id"))
      .withColumn("cosine", Exprs.cosine(col("__e_q"), col("__e_c")))
      .select("q_id", "nn_id", "cosine")
    Ann.topKPerQuery(cand, k)
  }
}
