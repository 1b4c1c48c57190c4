package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Exprs

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  *  - Brute-force cosine top-k: the exactness baseline — broadcast the query
  *    set, one pass over the corpus, per-query top-k via window rank. Scales
  *    linearly in |corpus| × |queries|; right when queries are few.
  *  - LSH-bucketed ANN (the scale path): 16 random-hyperplane bits, banded
  *    4×4; probe rows join candidates on any shared band — shuffle keyed by
  *    (band, bucket), never a crossJoin of the corpus with itself.
  *
  * The signature/norm kernel is a typed mapPartitions (JIT'd primitive
  * loops) because Spark higher-order Column functions are CodegenFallback —
  * interpreted per element (see Dedup.minhashSignature scaladoc; measured).
  * Pairwise cosine on candidate/broadcast joins stays as an `aggregate`
  * expression: the pair count is small by construction there.
  * Hyperplanes are pseudo-random signs from a splitmix64 of (plane, dim) —
  * reproducible with no RNG state.
  */
object Ann {

  /** Sequential-fold dot product of two float-array columns, in double. */
  def dot(a: String, b: String): Column =
    expr(s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
            |          CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)

  /** L2 norm column `__norm` appended (expression form — used where the
    * typed kernel's fixed output shape doesn't fit). */
  def withNorm(df: DataFrame, embCol: String): DataFrame =
    df.withColumn("__norm", sqrt(expr(
      s"""aggregate(transform($embCol, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
         |          CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)))

  /** Typed kernel: (id, embedding) → (id, embedding, __norm, __sig) where
    * __sig is the `bits`-bit hyperplane signature (bit p = sign of
    * ⟨emb, h_p⟩, h_p[i] = ±1 from splitmix64(p, i)). */
  def withNormSig(df: DataFrame, idCol: String, embCol: String, bits: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(embCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.map { case (id, emb) =>
          var nsq = 0.0
          var i = 0
          while (i < emb.length) { nsq += emb(i).toDouble * emb(i); i += 1 }
          var sig = 0
          var p = 0
          while (p < bits) {
            var d = 0.0
            var j = 0
            while (j < emb.length) {
              d += Hashing.planeSign(p, j) * emb(j).toDouble
              j += 1
            }
            if (d > 0) sig |= (1 << p)
            p += 1
          }
          (id, emb, math.sqrt(nsq), sig)
        }
      }
      .toDF(idCol, embCol, "__norm", "__sig")
  }

  /** Brute-force cosine top-k: queries broadcast against the corpus scan.
    * The pair cosine is the native codegen'd CosineSimilarity expression —
    * it stays fused inside the join's generated stage. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), col(embCol).as("__e_c"))
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("__e_q"))
    val sims = c.join(broadcast(q), col("q_id") =!= col("nn_id"))
      .withColumn("cosine", Exprs.cosine(col("__e_q"), col("__e_c")))
    sims
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("cosine").desc, col("nn_id"))))
      .filter(col("rank") <= k)
      .select("q_id", "nn_id", "rank", "cosine")
  }

  /** Band the 16-bit signature into four 4-bit buckets (multi-probe: a pair
    * agreeing on any 4-bit band becomes a candidate). */
  def bandBuckets(withSig: DataFrame, idCol: String): DataFrame =
    withSig.select(
      col("*"),
      explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS band, (shiftright(__sig, b * 4) & 15) AS bh))"))
        .as("__bk"))
      .withColumn("band", col("__bk.band"))
      .withColumn("bh", col("__bk.bh"))
      .drop("__bk")

  /** LSH band-bucket candidates: (q_id, nn_id, __e_q, __e_c), deduplicated
    * across bands. The only corpus-wide shuffles are keyed by (band, bh)
    * and (q_id, nn_id) — never a corpus self-join. `pinQueryBroadcast`
    * forces the banded query side into a broadcast hint (right for the
    * few-queries regime); without it the join is a plain (band, bh)
    * equi-join and Catalyst/AQE still broadcasts WHEN stats say the side is
    * small — the difference is that a huge query set degrades to a shuffle
    * instead of an OOM-prone forced broadcast. */
  private def lshCandidates(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, pinQueryBroadcast: Boolean = true): DataFrame = {
    val c = bandBuckets(withNormSig(corpus, idCol, embCol), idCol)
      .select(col("band"), col("bh"), col(idCol).as("nn_id"), col(embCol).as("__e_c"))
    val q = bandBuckets(withNormSig(queries, idCol, embCol), idCol)
      .select(col("band"), col("bh"), col(idCol).as("q_id"), col(embCol).as("__e_q"))
    c.join(if (pinQueryBroadcast) broadcast(q) else q, Seq("band", "bh"))
      .filter(col("q_id") =!= col("nn_id"))
      .dropDuplicates("q_id", "nn_id")
  }

  /** LSH ANN: per-query top-k among LSH band candidates. Same output shape
    * as bruteForceTopK; recall < 1 by construction, measured in the test
    * suite against the brute-force baseline.
    *
    * Ranking is a per-q_id window — right for the FEW-queries regime (the
    * window collapses parallelism to |queries| partitions and materializes
    * every candidate before ranking). For a large query set use
    * [[lshTopKAgg]]. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame =
    lshCandidates(corpus, queries, idCol, embCol)
      .withColumn("cosine", Exprs.cosine(col("__e_q"), col("__e_c")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("cosine").desc, col("nn_id"))))
      .filter(col("rank") <= k)
      .select("q_id", "nn_id", "rank", "cosine")

  /** Bounded top-k as a typed Aggregator: the buffer holds AT MOST k
    * (cosine, nn_id) pairs, ordered by (cosine desc, nn_id asc) — the same
    * total order the window form ranks by, so the two agree exactly.
    * Partial aggregation bounds each map task's state to k per local
    * q_id and the exchange to ≤k rows per (partition, q_id): parallelism
    * is NOT |queries|-bounded and nothing materializes the full candidate
    * list per query. */
  class TopKAgg(k: Int) extends org.apache.spark.sql.expressions.Aggregator[
      (Long, Long, Double), List[(Double, Long)], Seq[(Double, Long)]] {
    // Spark's sort order for doubles: NaN greater than everything, -0.0 ==
    // 0.0 (NormalizeFloatingNumbers). `>` alone would sink NaN entries
    // (every NaN comparison is false) and diverge from the window form.
    private def norm(d: Double): Double = if (d == 0.0) 0.0 else d
    private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
      val c = java.lang.Double.compare(norm(a._1), norm(b._1))
      c > 0 || (c == 0 && a._2 < b._2)
    }
    private def insert(buf: List[(Double, Long)], e: (Double, Long)): List[(Double, Long)] = {
      val (pre, post) = buf.span(better(_, e))
      val merged = pre ::: e :: post
      if (merged.length > k) merged.take(k) else merged
    }
    def zero: List[(Double, Long)] = Nil
    def reduce(buf: List[(Double, Long)], a: (Long, Long, Double)): List[(Double, Long)] =
      insert(buf, (a._3, a._2))
    def merge(x: List[(Double, Long)], y: List[(Double, Long)]): List[(Double, Long)] =
      y.foldLeft(x)(insert)
    def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf
    def bufferEncoder: org.apache.spark.sql.Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Rank (q_id, nn_id, cosine) similarity rows to per-query top-k through
    * [[TopKAgg]] — the many-queries ranking path, reusable over any
    * candidate generator (LSH bands, IVF probes, brute force). */
  def topKPerQuery(sims: DataFrame, k: Int): DataFrame = {
    val spark = sims.sparkSession
    import spark.implicits._
    sims.select(col("q_id").cast("long"), col("nn_id").cast("long"), col("cosine").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new TopKAgg(k).toColumn)
      .flatMap { case (q, top) =>
        top.iterator.zipWithIndex.map { case ((cos, nn), i) => (q, nn, i + 1, cos) }
      }
      .toDF("q_id", "nn_id", "rank", "cosine")
  }

  /** LSH ANN for LARGE query sets: identical results to [[lshTopK]]
    * (equivalence asserted in LlmSpec), ranked by bounded aggregation
    * instead of a per-q_id window, and candidates joined WITHOUT the
    * query-side broadcast hint — no stage is |queries|-bounded (PlanSpec
    * asserts neither a Window nor a pinned BroadcastExchange survives with
    * auto-broadcast off). */
  def lshTopKAgg(corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame =
    topKPerQuery(
      lshCandidates(corpus, queries, idCol, embCol, pinQueryBroadcast = false)
        .withColumn("cosine", Exprs.cosine(col("__e_q"), col("__e_c"))),
      k)
}
