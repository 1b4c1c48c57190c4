package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed PCA / whitening over an embedding column (round 13):
  * the linear-algebra tail several of the engine's embedding operators
  * want — SemDeDup-style pipelines whiten before cosine thresholds,
  * IVF/PQ recall improves on decorrelated coordinates, and "energy in
  * the top-k components" is the standard embedding-collapse diagnostic.
  *
  * Scale shape — the covariance trick: ONE distributed pass folds the
  * corpus to (n, Σx, Σxxᵀ), merged associatively across partitions —
  * d(d+3)/2 doubles of state, so the driver step is model-bounded (the
  * SCALING.md bounded-collect posture: d=1024 is 4 MiB of upper
  * triangle, independent of corpus size). The d×d eigensolve is cyclic
  * Jacobi on the driver — O(d³) once, not per row — and projection /
  * whitening broadcast the basis and run as pure map stages.
  *
  * Determinism contract (what makes the DuckDB oracle possible):
  *  - covariance uses the population (1/n) normalizer, documented;
  *  - eigenpairs sort by eigenvalue DESC, ties by original axis order;
  *  - each eigenvector is canonicalized so its first component of
  *    magnitude > 1e-9 is positive — Jacobi's sign freedom would
  *    otherwise flip projection signs run to run.
  * The q_embed_pca fixture constructs embeddings whose covariance is
  * EXACT in double arithmetic (balanced ±1 patterns, half-integer
  * components, integer sums below 2^53 — exact regardless of reduce
  * order), so eigenvalues and scores are known integers and a round()
  * bridges Jacobi's 1e-14 to the oracle's exact compare.
  *
  * Reference scope: kafi has no linear algebra; LLM-pipeline extension
  * breadth, sibling to [[Dedup.semDedup]]/[[Ivf]].
  */
object Pca {

  /** `basis` rows are unit eigenvectors, eigenvalue-descending. */
  case class PcaModel(mean: Array[Double], eigvals: Array[Double],
      basis: Array[Array[Double]])

  /** Accumulator: count, per-dim sums, upper-triangle of Σxxᵀ. */
  private final class Acc(val d: Int) extends Serializable {
    var n: Long = 0L
    val s: Array[Double] = new Array[Double](d)
    val ss: Array[Double] = new Array[Double](d * (d + 1) / 2)
    def add(x: Array[Double]): this.type = {
      // degrade-never-throw: a ragged or null embedding is skipped, not
      // a task failure — the model is fit over the uniform-d majority
      if (x == null || x.length != d) return this
      n += 1
      var i = 0; var k = 0
      while (i < d) {
        s(i) += x(i)
        var j = i
        while (j < d) { ss(k) += x(i) * x(j); k += 1; j += 1 }
        i += 1
      }
      this
    }
    def merge(o: Acc): this.type = {
      n += o.n
      var i = 0
      while (i < d) { s(i) += o.s(i); i += 1 }
      var k = 0
      while (k < ss.length) { ss(k) += o.ss(k); k += 1 }
      this
    }
  }

  /** Cyclic Jacobi eigensolve of a symmetric d×d matrix. Returns
    * (eigenvalues, eigenvectors as rows), unsorted. */
  private[graft] def jacobi(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-22) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          off += a(p)(q) * a(p)(q)
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - s * vqk
              v(q)(k) = s * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** One pass over `vecCol` (array<double>) → model. */
  def fit(df: DataFrame, vecCol: String): PcaModel = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(vecCol).cast("array<double>")).as[Array[Double]]
    // RDD hop: the Acc is a mutable accumulator, not an encodable row —
    // and the tree aggregation is the point: partial sums merge
    // log-depth across executors instead of funneling every partition
    // into the driver
    // treeAggregate with a null zero: ONE job (an isEmpty pre-check
    // would re-scan the corpus), and a zero-row corpus (filtered
    // partition, dry re-run) falls through to a degenerate model
    // instead of treeReduce's empty-collection throw — project/whiten
    // over the same empty corpus then emit zero rows
    val acc = vecs.rdd.treeAggregate(null: Acc)(
      (a, x) => if (x == null) a
        else { val b = if (a == null) new Acc(x.length) else a; b.add(x) },
      (a, b) => if (a == null) b else if (b == null) a else a.merge(b),
      depth = 2)
    if (acc == null) return PcaModel(Array.empty, Array.empty, Array.empty)
    val d = acc.d
    val n = acc.n.toDouble
    val mean = acc.s.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0; var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = acc.ss(k) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        k += 1; j += 1
      }
      i += 1
    }
    val (vals, vecsRows) = jacobi(cov)
    val order = (0 until d).sortBy(ix => (-vals(ix), ix))
    val basis = order.map { ix =>
      val row = vecsRows(ix)
      val lead = row.indexWhere(x => math.abs(x) > 1e-9)
      if (lead >= 0 && row(lead) < 0) row.map(-_) else row.clone()
    }.toArray
    PcaModel(mean, order.map(vals(_)).toArray, basis)
  }

  /** Top-k projection, a pure map stage against the broadcast model.
    * Output: (idCol, pc_0 … pc_{k-1}). */
  def project(df: DataFrame, idCol: String, vecCol: String,
      model: PcaModel, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val kk = k
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, x) =>
        val m = bc.value
        // ragged guard mirrors fit: only the dims both sides share
        // contribute, so a short/long/null vector degrades, never throws
        val lim = if (x == null) 0 else math.min(x.length, m.mean.length)
        val scores = Array.tabulate(kk) { c =>
          var s = 0.0; var i = 0
          while (i < lim) { s += m.basis(c)(i) * (x(i) - m.mean(i)); i += 1 }
          s
        }
        (id, scores)
      }
      .select(col("_1").as(idCol) +: (0 until kk).map(c =>
        col("_2").getItem(c).as(s"pc_$c")): _*)
  }

  /** Whitened top-k projection: scores scaled by 1/sqrt(λ) — unit
    * variance per kept component; components with λ ≤ eps are dropped
    * to zero (a collapsed direction carries no signal to rescale). */
  def whiten(df: DataFrame, idCol: String, vecCol: String,
      model: PcaModel, k: Int, eps: Double = 1e-9): DataFrame = {
    val scale = Array.tabulate(k)(c =>
      if (c < model.eigvals.length && model.eigvals(c) > eps)
        1.0 / math.sqrt(model.eigvals(c)) else 0.0)
    val proj = project(df, idCol, vecCol, model, k)
    (0 until k).foldLeft(proj)((d, c) => d.withColumn(s"pc_$c", col(s"pc_$c") * scale(c)))
  }
}
