package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streams.ZSet

/** Model-based property checks: every Z-set operator compared against a
  * plain-Scala reference model (Map[key -> weight]) over seeded random
  * inputs — the DBSP algebra laws hold not just on the hand-picked
  * ZSetSpec examples but across arbitrary weight mixes (retractions,
  * cancellations, disjoint keys). Seeded Random keeps failures
  * reproducible.
  */
class ZSetLawsSpec extends SparkSpec {

  import spark.implicits._

  private def canon(df: DataFrame): Map[String, Long] =
    ZSet.consolidate(df).select("k", ZSet.W).as[(String, Long)].collect().toMap

  private def model(rows: Seq[(String, Long)]): Map[String, Long] =
    rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).filter(_._2 != 0L).toMap

  private def positives(m: Map[String, Long]): Map[String, Long] =
    m.collect { case (k, w) if w > 0 => k -> 1L }

  test("random Z-sets: consolidate/distinct/merge/union/minus/intersect match the model") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 8) {
      val ra = Seq.fill(12)((s"k${rnd.nextInt(6)}", (rnd.nextInt(6) - 2).toLong)).filter(_._2 != 0)
      val rb = Seq.fill(12)((s"k${rnd.nextInt(6)}", (rnd.nextInt(6) - 2).toLong)).filter(_._2 != 0)
      val a = ra.toDF("k", ZSet.W)
      val b = rb.toDF("k", ZSet.W)
      val (ma, mb) = (model(ra), model(rb))
      assert(canon(a) == ma, s"consolidate, trial $trial")
      assert(canon(ZSet.distinct(a)) == positives(ma), s"distinct, trial $trial")
      assert(canon(ZSet.merge(a, b)) == model(ra ++ rb), s"merge, trial $trial")
      assert(canon(ZSet.union(a, b)) == positives(model(ra ++ rb)), s"union, trial $trial")
      // minus = distinct(a + neg b): present in a's sum net of b's
      val mMinus = positives(model(ra ++ rb.map { case (k, w) => (k, -w) }))
      assert(canon(ZSet.minus(a, b)) == mMinus, s"minus, trial $trial")
      // intersect: present (weight > 0) on BOTH sides -> weight 1
      val mInt = positives(ma).keySet.intersect(positives(mb).keySet).map(_ -> 1L).toMap
      assert(canon(ZSet.intersect(a, b)) == mInt, s"intersect, trial $trial")
      assert(canon(ZSet.consolidate(ZSet.neg(ZSet.neg(a)))) == ma, s"neg.neg, trial $trial")
    }
  }

  test("random Z-sets: join is bilinear and distributes over merge") {
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 5) {
      def mk(n: Int, col: String) = {
        val rows = Seq.fill(n)((s"k${rnd.nextInt(4)}", (rnd.nextInt(6) - 2).toLong)).filter(_._2 != 0)
        (rows, rows.toDF(col, ZSet.W))
      }
      val (ra, a) = mk(8, "ka")
      val (rb, b) = mk(8, "kb")
      val (rc, c) = mk(8, "kc")
      // per-key model: join weight = (sum of a's weights) * (sum of b's)
      def mJoin(x: Seq[(String, Long)], y: Seq[(String, Long)]): Map[String, Long] = {
        val (mx, my) = (model(x), model(y))
        mx.keySet.intersect(my.keySet).map(k => k -> mx(k) * my(k)).filter(_._2 != 0L).toMap
      }
      def joined(l: DataFrame, lk: String, r: DataFrame, rk: String): Map[String, Long] =
        canon(ZSet.map(ZSet.join(l, r, col(lk) === col(rk)))(col(lk).as("k")))
      assert(joined(a, "ka", b, "kb") == mJoin(ra, rb), s"join, trial $trial")
      // bilinearity: join(a + b', c) = join(a, c) + join(b', c)
      val bAsA = b.withColumnRenamed("kb", "ka")
      val lhs = joined(ZSet.merge(a, bAsA), "ka", c, "kc")
      val rhs = model(
        mJoin(ra, rc).toSeq ++ mJoin(rb, rc).toSeq)
      assert(lhs == rhs, s"bilinearity, trial $trial")
    }
  }
}
