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
}
