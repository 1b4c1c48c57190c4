package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

/** Margin-based bitext mining (round 15): the hand case the method
  * exists for — a HUB vector close to everything outranks the true
  * translation on raw cosine for no query, but its margin is pulled
  * under 1 by its own high neighborhood mean, while aligned pairs
  * score well above. Artetxe & Schwenk 2019 §3 (ratio margin), §4
  * (intersection criterion). */
class BitextSpec extends AnyFunSuite {

  private def df(rows: Seq[(Long, Array[Float])]) = {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("margin demotes the hub; mutual-best aligned pairs mine at 1.05") {
    // src: the axes. tgt: near-copies of each axis plus a hub at 45°
    // (cos ≈ 0.707 to BOTH axes — the highest cosine nothing aligns to).
    val src = df(Seq(1L -> Array(1f, 0f), 3L -> Array(0f, 1f)))
    val tgt = df(Seq(
      2L -> Array(0.95f, 0.05f), 4L -> Array(0.05f, 0.95f),
      6L -> Array(0.7f, 0.7f)))
    val pairs = Bitext.marginPairs(src, tgt, "vec_id", "embedding", k = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(4), r.getInt(5)))).toMap
    // aligned pairs: strong margins, mutual both ways
    assert(pairs((1L, 2L))._1 > 1.2 && pairs((1L, 2L))._2 == 1)
    assert(pairs((3L, 4L))._1 > 1.2 && pairs((3L, 4L))._2 == 1)
    // the hub IS in both top-2 lists (raw cosine loves it) but its own
    // neighborhood mean is high, so the ratio margin drops below 1
    assert(pairs.contains((1L, 6L)) && pairs.contains((3L, 6L)))
    assert(pairs((1L, 6L))._1 < 1.0 && pairs((3L, 6L))._1 < 1.0,
      "hubness normalizes away")
    // the acceptance gate keeps exactly the aligned pairs
    val mined = Bitext.mine(src, tgt, "vec_id", "embedding", k = 2, threshold = 1.05)
      .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mined == Set((1L, 2L), (3L, 4L)))
    // ranks: forward lists are k-bounded and 1-based
    val ranks = Bitext.marginPairs(src, tgt, "vec_id", "embedding", k = 2)
      .filter(col("q_id") === 1L).select("rank").collect().map(_.getInt(0)).sorted
    assert(ranks.toSeq == Seq(1, 2))
  }

  test("marginPairsFrom is the pluggable seam: identical lists -> identical margins") {
    // property 1 (exact): feeding the SAME brute lists through the seam
    // reproduces marginPairs bit-for-bit — the arithmetic lives once
    val spark = graft.SparkSpec.session
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val src = e.filter(col("vec_id") < 40)
    val tgt = e.filter(col("vec_id") >= 40 && col("vec_id") < 80)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getInt(2), r.getDouble(3), r.getDouble(4), r.getInt(5)))).toMap
    val direct = collect(Bitext.marginPairs(src, tgt, "vec_id", "embedding", k = 4))
    val seam = collect(Bitext.marginPairsFrom(
      Ann.bruteForceTopK(tgt, src, "vec_id", "embedding", 4),
      Ann.bruteForceTopK(src, tgt, "vec_id", "embedding", 4)))
    assert(direct == seam, "same lists in, same rows out — including the doubles")
    // property 2 (scale path): on a corpus where LSH recall is TOTAL,
    // LSH-fed margins equal brute-fed margins row for row. Positive
    // scaling preserves every hyperplane sign, so scaled clones share
    // signatures and bucket together in every band — each side's top-2
    // is exactly the other side's two scaled copies of its base, and
    // the approximate lists provably equal the exact ones
    import org.apache.spark.sql.functions.{expr, lit}
    val bases = e.filter(col("vec_id") < 10)
    def scaled(ds: org.apache.spark.sql.DataFrame, factor: Double, idOff: Long) =
      ds.select((col("vec_id") + lit(idOff)).as("vec_id"),
        expr(s"transform(embedding, x -> CAST(x * $factor AS FLOAT))").as("embedding"))
    val src2 = scaled(bases, 1.0, 0).unionByName(scaled(bases, 2.0, 100))
    val tgt2 = scaled(bases, 3.0, 200).unionByName(scaled(bases, 4.0, 300))
    val bruteM = collect(Bitext.marginPairsFrom(
      Ann.bruteForceTopK(tgt2, src2, "vec_id", "embedding", 2),
      Ann.bruteForceTopK(src2, tgt2, "vec_id", "embedding", 2)))
    val lshM = collect(Bitext.marginPairsFrom(
      Ann.lshTopK(tgt2, src2, "vec_id", "embedding", 2),
      Ann.lshTopK(src2, tgt2, "vec_id", "embedding", 2)))
    assert(bruteM.nonEmpty && lshM == bruteM,
      "total-recall corpus: LSH-fed rows equal brute-fed rows exactly")
  }
}
