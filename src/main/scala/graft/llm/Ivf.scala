package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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

  /** element-wise integer SUM of quantized vectors per group (posexplode +
    * groupBy(dim) stays columnar and shuffles (id, dim, v)). Sums, not
    * means: cosine assignment is scale-invariant, and integer sums are
    * order-independent — bit-identical across engines and cluster sizes,
    * where a floating mean depends on reduction order. */
  private def sumVectors(assigned: DataFrame): DataFrame =
    assigned
      .select(col("list_id"), posexplode(col("__q")).as(Seq("dim", "v")))
      .groupBy("list_id", "dim")
      .agg(sum("v").as("sv"))
      .groupBy("list_id")
      .agg(expr("transform(array_sort(collect_list(struct(dim, sv))), x -> x.sv)").as("centroid"))

  /** Nearest-centroid assignment: broadcast the k-row centroid table.
    * Cosine casts the integer centroid through float — the same conversion
    * chain the oracle replays. */
  private def assign(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus
      .crossJoin(broadcast(centroids))
      .withColumn("__sim", Exprs.cosine(col("embedding"), col("centroid")))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("__sim").desc, col("list_id"))))
      .filter(col("__rk") === 1)
      .drop("__sim", "__rk", "centroid")

  /** Train k centroids with `iters` Lloyd iterations. `df` needs
    * (vec_id: long, embedding: array<float>). Centroids are integer
    * vectors (quantized sums — scale irrelevant under cosine). */
  def train(df: DataFrame, k: Int, iters: Int = 3): DataFrame = {
    // deterministic seed: the k hash-smallest vectors by splitmix64(vec_id)
    // — a TakeOrdered (top-k per partition + k-way merge), never a global
    // sort; the row_number window then runs over only k rows
    val quant = withQuantized(df)
    val sample = quant.orderBy("__h").limit(k)
    var centroids: DataFrame = sample.select(
      (row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("__h")) - 1).as("list_id"),
      col("__q").as("centroid"))
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
    centroids
  }

  /** Index: (vec_id, embedding, list_id). Write with partitionBy("list_id")
    * for probe-local reads at rest. */
  def index(df: DataFrame, centroids: DataFrame): DataFrame =
    assign(df.select("vec_id", "embedding"), centroids)

  /** Search: top-k by cosine among the nprobe nearest lists per query. */
  def search(indexed: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int = 4): DataFrame = {
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
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("cosine").desc, col("nn_id"))))
      .filter(col("rank") <= k)
      .select("q_id", "nn_id", "rank", "cosine")
  }
}
