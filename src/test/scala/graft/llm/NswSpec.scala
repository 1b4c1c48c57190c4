package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Graph ANN (round 15): exhaustive-ef brute equality (the q_ann_nsw
  * contract), the graded-ef approximate regime, determinism, and the
  * never-throw input posture. */
class NswSpec extends AnyFunSuite {

  // deterministic pseudo-embeddings: 8 dims from splitmix64, scaled to
  // ±1 — enough spread that top-k lists have no accidental cosine ties
  private def vec(id: Long): Array[Float] =
    Array.tabulate(8)(d =>
      (Hashing.splitmix64(id * 31 + d).toDouble / Long.MaxValue.toDouble).toFloat)

  private def corpus(n: Int, parts: Int): DataFrame = {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    (0 until n).map(i => (i.toLong, vec(i.toLong))).toDF("vec_id", "embedding")
      .repartition(parts)
  }

  private def rows(df: DataFrame): List[(Long, Long, Int)] =
    df.select(col("q_id"), col("nn_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toList.sorted

  test("exhaustive ef equals brute force exactly, across partitions") {
    val c = corpus(120, 7)
    val q = c.filter(col("vec_id") < 6)
    val brute = rows(Ann.bruteForceTopK(c, q, "vec_id", "embedding", 8))
    val graph = rows(Nsw.searchTopK(c, q, "vec_id", "embedding", k = 8,
      m = 4, efConstruction = 16, ef = 1000))
    assert(graph == brute)
  }

  test("graded ef: small beams still recall most true neighbors") {
    val c = corpus(200, 1)
    val q = c.filter(col("vec_id") < 5)
    val truth = rows(Ann.bruteForceTopK(c, q, "vec_id", "embedding", 5)).toSet
    val approx = rows(Nsw.searchTopK(c, q, "vec_id", "embedding", k = 5,
      m = 6, efConstruction = 24, ef = 24)).map { case (a, b, _) => (a, b) }.toSet
    val hits = truth.count { case (a, b, _) => approx.contains((a, b)) }
    assert(hits >= (truth.size * 7) / 10, s"recall $hits/${truth.size}")
  }

  test("search is deterministic run to run") {
    val c = corpus(90, 5)
    val q = c.filter(col("vec_id") < 4)
    val a = rows(Nsw.searchTopK(c, q, "vec_id", "embedding", k = 6, ef = 12))
    val b = rows(Nsw.searchTopK(c, q, "vec_id", "embedding", k = 6, ef = 12))
    assert(a == b)
  }

  test("null and empty embeddings are skipped, never thrown") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val c = Seq(
      (1L, vec(1)), (2L, vec(2)), (3L, null.asInstanceOf[Array[Float]]),
      (4L, Array.empty[Float]), (5L, vec(5)))
      .toDF("vec_id", "embedding")
    val out = Nsw.searchTopK(c, c.filter(col("vec_id") === 1L || col("vec_id") === 3L),
      "vec_id", "embedding", k = 10, ef = 100)
    // null/empty rows vanish from both sides; query 1 sees 2 and 5 only
    assert(rows(out).map { case (q, n, _) => (q, n) }.toSet == Set((1L, 2L), (1L, 5L)))
  }

  test("prebuilt index search equals the fused build+search, incl. via parquet") {
    val c = corpus(100, 6).persist()
    try {
      c.count()
      val q = c.filter(col("vec_id") < 5)
      val direct = rows(Nsw.searchTopK(c, q, "vec_id", "embedding", k = 6,
        m = 4, efConstruction = 16, ef = 20))
      val idx = Nsw.index(c, "vec_id", "embedding", m = 4, efConstruction = 16)
      assert(rows(Nsw.searchIndex(idx, q, "vec_id", "embedding", k = 6, ef = 20)) == direct)
      // the index is a first-class dataset: parquet roundtrip preserves
      // the graphs (the backbone chain is positional, so it travels free)
      val dir = java.nio.file.Files.createTempDirectory("graft_nsw_idx").toString
      try {
        idx.write.mode("overwrite").parquet(dir)
        val reloaded = graft.SparkSpec.session.read.parquet(dir)
        assert(rows(Nsw.searchIndex(reloaded, q, "vec_id", "embedding", k = 6, ef = 20)) == direct)
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    } finally c.unpersist(blocking = false)
  }

  test("rank order ties on cosine break by ascending id (TopKAgg order)") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    // 20 and 30 are identical vectors → identical cosine to the query
    val c = Seq(
      (10L, Array(1f, 0f)), (20L, Array(1f, 1f)), (30L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val out = rows(Nsw.searchTopK(c, c.filter(col("vec_id") === 10L),
      "vec_id", "embedding", k = 3, ef = 100))
    assert(out == List((10L, 20L, 1), (10L, 30L, 2)))
  }
}
