package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Embedding-matrix transforms for the retrieval/dedup pipeline: the
  * dimensionality-reduction step that sits between raw encoder output and
  * the ANN index ([[Ann]]/[[Ivf]]/[[Pq]]). The reference has no embedding
  * ops at all — this is part of the beyond-reference training-data surface
  * (SURVEY §6), where 100 TB corpora carry billions of 1k-dim vectors and
  * the index wants 64.
  *
  * Johnson–Lindenstrauss random projection with a RADEMACHER (±1) matrix
  * (Achlioptas 2003, "Database-friendly random projections"): ±1 entries
  * preserve pairwise distances with the same JL guarantee as Gaussian
  * matrices, and — the reason it's chosen here — make the projection
  * EXACT INTEGER arithmetic over the engine's micro-quantized embeddings:
  * y_j = Σ_i sign(j,i)·q_i with q_i = floor(e_i·2²⁰) (the [[Ivf]]
  * quantization convention) and sign(j,i) = [[Hashing.planeSign]] — the
  * deterministic splitmix64 kernel the SimHash/hyperplane-LSH family
  * already uses, replayed bit-exact by DuckDB's `planesign` macro
  * (graft/queries/HashOracle.scala:41). No RNG state, no materialized
  * matrix: the projection is a pure function of (row, output dim), so any
  * two engines — or two runs over different partitionings — produce
  * identical integers.
  *
  * Scale shape: ONE map stage. The ±1 matrix is never built, broadcast,
  * or shuffled (at d=1024, d'=64 it would be 64k entries per task — trivial
  * here, but the hash form also keeps the operator stateless for the
  * streaming path). Output magnitudes are bounded by d·2²⁰·max|e| — safe
  * in Long to ~10⁶ input dims. Cosine on the projected integers needs no
  * rescaling (scale-invariant), so the output feeds [[Ann.bruteTopK]]
  * directly. */
object Embeddings {

  /** Project `embCol` (array<float>, any input dim) down to `dimOut`
    * integer components. Output: (idCol, proj: array<long> — micro-unit
    * Rademacher sums). Null/empty embeddings project to all-zero vectors
    * (documented, not dropped: downstream ranking sees them last, same as
    * [[Ivf]]'s null posture). */
  def projectRademacher(df: DataFrame, idCol: String, embCol: String,
      dimOut: Int): DataFrame = {
    require(dimOut > 0, "dimOut must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(embCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, e) =>
        val out = new Array[Long](dimOut)
        if (e != null) {
          // quantize once per input component, not once per (i, j) pair
          val q = new Array[Long](e.length)
          var i = 0
          while (i < e.length) {
            q(i) = math.floor(e(i).toDouble * 1048576.0).toLong
            i += 1
          }
          var j = 0
          while (j < dimOut) {
            var acc = 0L
            i = 0
            while (i < q.length) {
              acc += Hashing.planeSign(j, i) * q(i)
              i += 1
            }
            out(j) = acc
            j += 1
          }
        }
        (id, out)
      })
      .toDF(idCol, "proj")
  }
}
