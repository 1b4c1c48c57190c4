package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streams.{Debezium, TNode, ZSet}

/** Z-set algebra laws (the invariants the reference's DBSP circuit
  * guarantees, asserted over the batch implementation). */
class ZSetSpec extends SparkSpec {

  import spark.implicits._

  private def zs(rows: (String, Long)*): DataFrame =
    rows.toDF("k", ZSet.W)

  private def records(df: DataFrame): Set[(String, Long)] =
    df.select("k", ZSet.W).as[(String, Long)].collect().toSet

  test("distinct: weight>0 -> 1, retractions suppress") {
    val z = zs("a" -> 2L, "b" -> 1L, "b" -> -1L, "c" -> -3L)
    assert(records(ZSet.distinct(z)) == Set("a" -> 1L))
  }

  test("distinct is idempotent") {
    val z = zs("a" -> 5L, "b" -> 1L)
    assert(records(ZSet.distinct(ZSet.distinct(z))) == records(ZSet.distinct(z)))
  }

  test("merge adds weights; union applies distinct") {
    val a = zs("x" -> 1L, "y" -> 2L)
    val b = zs("x" -> 3L, "z" -> -1L)
    assert(records(ZSet.merge(a, b)) == Set("x" -> 4L, "y" -> 2L, "z" -> -1L))
    assert(records(ZSet.union(a, b)) == Set("x" -> 1L, "y" -> 1L))
  }

  test("minus(a, a) is empty; intersect projects left presence") {
    val a = zs("x" -> 1L, "y" -> 2L)
    assert(ZSet.minus(a, a).count() == 0)
    val b = zs("y" -> 7L, "z" -> 1L)
    assert(records(ZSet.intersect(a, b)) == Set("y" -> 1L))
  }

  test("join multiplies weights (bilinear)") {
    val a = Seq(("k1", 2L)).toDF("ka", ZSet.W)
    val b = Seq(("k1", 3L), ("k1", -1L)).toDF("kb", ZSet.W)
    val j = ZSet.consolidate(
      ZSet.map(ZSet.join(a, b, col("ka") === col("kb")))(col("ka")))
    assert(j.select(ZSet.W).as[Long].collect().toSeq == Seq(4L)) // 2*3 + 2*(-1)
  }

  test("neg . neg = identity under consolidation") {
    val a = zs("x" -> 2L, "y" -> -1L)
    assert(records(ZSet.consolidate(ZSet.neg(ZSet.neg(a)))) == records(ZSet.consolidate(a)))
  }

  test("debezium roundtrip: zset -> cdc -> zset") {
    val z = ZSet.consolidate(zs("a" -> 2L, "b" -> -1L))
    val cdc = Debezium.toDebezium(z)
    val back = cdc.select(
      struct(col("k")).as("rec"),
      when(col("op") === "c", col("multiplicity")).otherwise(-col("multiplicity")).as(ZSet.W))
      .select(col("rec.k").as("k"), col(ZSet.W))
    assert(records(ZSet.consolidate(back)) == records(z))
  }

  test("bilinear join delta equals full recomputation (incremental IVM)") {
    // integrated states
    val a = Seq(("x", 1L), ("y", 2L)).toDF("ka", ZSet.W)
    val b = Seq(("x", 1L), ("z", 1L)).toDF("kb", ZSet.W)
    // step deltas: insert + retraction on both sides
    val da = Seq(("x", 1L), ("y", -1L), ("z", 3L)).toDF("ka", ZSet.W)
    val db = Seq(("x", -1L), ("y", 2L)).toDF("kb", ZSet.W)
    val cond = col("ka") === col("kb")
    def norm(df: DataFrame) =
      ZSet.consolidate(df).select("ka", "kb", ZSet.W).as[(String, String, Long)].collect().toSet
    val full =
      norm(ZSet.join(ZSet.merge(a, da), ZSet.merge(b, db), cond))
    val incremental =
      norm(ZSet.merge(ZSet.join(a, b, cond), ZSet.joinDelta(a, da, b, db, cond)))
    assert(full == incremental)
  }

  test("struct-record folds: mergeable RowFold agrees with refold on commutative folds") {
    import graft.streams.Aggregators
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.LongType
    val df = Seq(
      ("u1", 1L, 3L), ("u1", 2L, -5L), ("u1", 3L, 4L),
      ("u2", 1L, 10L), ("u2", 2L, -20L))
      .toDF("k", "seq", "v")
    // commutative fold (sum of v*v): both paths must agree
    val mergeable = new Aggregators.RowFold[Long](
      0L, (b, r) => b + r.getLong(1) * r.getLong(1), _ + _)(Encoders.scalaLong)
    val viaUdaf = Aggregators.groupByAggRows(df, Seq("k"), Seq("seq", "v"), mergeable, "s")
      .as[(String, Long)].collect().toMap
    val viaRefold = Aggregators.groupByAggRefold(df, Seq("k"), Seq("seq"),
        0L, (b: Long, r: Row) => b + r.getLong(1) * r.getLong(1), "s", LongType)
      .as[(String, Long)].collect().toMap
    assert(viaUdaf == viaRefold)
    assert(viaUdaf("u1") == 9L + 25L + 16L && viaUdaf("u2") == 100L + 400L)
  }

  test("refold is order-sensitive: floor-at-zero balance depends on the fold order") {
    import graft.streams.Aggregators
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    // order by seq: max(0, 0+3)=3 -> max(0, 3-5)=0 -> max(0, 0+4)=4
    // a commutative mis-evaluation (e.g. sum then floor) would give 2
    val df = Seq(("u", 1L, 3L), ("u", 2L, -5L), ("u", 3L, 4L)).toDF("k", "seq", "v")
    val got = Aggregators.groupByAggRefold(df, Seq("k"), Seq("seq"),
        0L, (b: Long, r: Row) => math.max(0L, b + r.getLong(1)), "bal", LongType)
      .as[(String, Long)].collect().toMap
    assert(got("u") == 4L)
  }

  test("topology DSL: memoized build + mermaid rendering") {
    val src = TNode.source("s", zs("a" -> 1L, "a" -> 1L, "b" -> 1L))
    val top = src.distinct.groupByCount(Seq("k"), "n")
    val out = top.df.select("k", "n").as[(String, Long)].collect().toSet
    assert(out == Set("a" -> 1L, "b" -> 1L))
    assert(top.mermaid.contains("graph TD"))
    assert(top.topology.startsWith("group_by_count"))
    top.reset()
    assert(top.df.count() == 2)
  }
}
