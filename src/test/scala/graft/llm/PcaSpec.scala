package graft.llm

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Distributed PCA / whitening (round 13). */
class PcaSpec extends AnyFunSuite with SparkSpec {

  private def approx(a: Double, b: Double, tol: Double = 1e-9) =
    math.abs(a - b) <= tol

  test("jacobi: known 2x2 and 3x3 eigensystems, reconstruction, orthonormality") {
    // [[2,1],[1,2]] → eigvals 3, 1; eigvecs (1,1)/√2, (1,-1)/√2
    val (v2, e2) = Pca.jacobi(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(v2.sorted.zip(Array(1.0, 3.0)).forall { case (a, b) => approx(a, b) })
    // every returned row is unit and A·v = λ·v
    val a3 = Array(
      Array(4.0, 1.0, 0.5),
      Array(1.0, 3.0, -1.0),
      Array(0.5, -1.0, 2.0))
    val (vals, vecs) = Pca.jacobi(a3)
    (0 until 3).foreach { i =>
      val v = vecs(i)
      assert(approx(v.map(x => x * x).sum, 1.0, 1e-9), "unit")
      val av = Array.tabulate(3)(r => (0 until 3).map(c => a3(r)(c) * v(c)).sum)
      (0 until 3).foreach(r => assert(approx(av(r), vals(i) * v(r), 1e-8), s"A·v=λv at $i,$r"))
    }
    // trace preserved
    assert(approx(vals.sum, 9.0, 1e-9))
    // orthogonality across rows
    assert(approx((0 until 3).map(c => vecs(0)(c) * vecs(1)(c)).sum, 0.0, 1e-9))
    assert(approx(e2(0).map(x => x * x).sum, 1.0))
  }

  test("fit recovers an exact planted eigensystem; projection and whitening") {
    import spark.implicits._
    // the q_embed_pca construction: x = μ + a1·v1 + a2·v2 with balanced
    // amplitudes (N % 20 == 0) ⇒ cov = 44·v1v1ᵀ/4-scale … exactly
    val n = 200
    val rows = (0L until n.toLong).map { id =>
      val m5 = (id % 5).toDouble + 1.0
      val a1 = 2.0 * (1 - 2 * (id % 2)) * m5
      val a2 = 1.0 * (1 - 2 * ((id % 4) / 2)) * m5
      val x = Array.tabulate(4) { c =>
        val v1 = 0.5
        val v2 = if (c % 2 == 0) 0.5 else -0.5
        (c + 1).toDouble + a1 * v1 + a2 * v2
      }
      (id, x)
    }
    val df = rows.toDF("doc_id", "emb")
    val model = Pca.fit(df, "emb")
    assert(model.mean.zip(Array(1.0, 2.0, 3.0, 4.0)).forall { case (a, b) => approx(a, b) })
    assert(approx(model.eigvals(0), 44.0, 1e-9))
    assert(approx(model.eigvals(1), 11.0, 1e-9))
    assert(approx(model.eigvals(2), 0.0, 1e-9) && approx(model.eigvals(3), 0.0, 1e-9))
    // canonical sign: first big component positive ⇒ basis(0) = v1, basis(1) = v2
    assert(model.basis(0).forall(c => approx(c, 0.5, 1e-9)))
    assert(model.basis(1).zipWithIndex.forall { case (c, i) =>
      approx(c, if (i % 2 == 0) 0.5 else -0.5, 1e-9) })
    // projection returns the planted amplitudes
    val proj = Pca.project(df, "doc_id", "emb", model, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    rows.zip(proj).foreach { case ((id, _), (pid, p1, p2)) =>
      val m5 = (id % 5).toDouble + 1.0
      assert(pid == id)
      assert(approx(p1, 2.0 * (1 - 2 * (id % 2)) * m5, 1e-9))
      assert(approx(p2, 1.0 * (1 - 2 * ((id % 4) / 2)) * m5, 1e-9))
    }
    // whitening: unit population variance on kept components
    val w = Pca.whiten(df, "doc_id", "emb", model, 2)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val v1 = w.map(_._1).map(x => x * x).sum / n
    val v2 = w.map(_._2).map(x => x * x).sum / n
    assert(approx(v1, 1.0, 1e-9) && approx(v2, 1.0, 1e-9))
  }

  test("degenerate inputs: constant column, single row, zero eigvals in whiten") {
    import spark.implicits._
    val df = (0L until 20L).map(id => (id, Array(5.0, id.toDouble % 2))).toDF("id", "e")
    val m = Pca.fit(df, "e")
    // one informative direction; the constant one has eigenvalue 0
    assert(approx(m.eigvals(0), 0.25, 1e-9) && approx(m.eigvals(1), 0.0, 1e-9))
    // whiten must not divide by ~0 on the dead component
    val w = Pca.whiten(df, "id", "e", m, 2).collect()
    assert(w.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
    val one = Pca.fit((0L to 0L).map(id => (id, Array(1.0, 2.0))).toDF("id", "e"), "e")
    assert(one.eigvals.forall(v => approx(v, 0.0, 1e-12)))
    // zero-row corpus: degenerate model, zero-row projection, no throw
    val empty = df.filter(col("id") < 0)
    val em = Pca.fit(empty, "e")
    assert(em.eigvals.isEmpty && em.basis.isEmpty)
    assert(Pca.project(empty, "id", "e", em, 2).count() == 0)
    assert(Pca.whiten(empty, "id", "e", em, 2).count() == 0)
  }
}
