package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.Fuzzy

/** Contract suite for the exact edit-distance join: the blocked operator
  * must agree PAIR-FOR-PAIR with brute force (cross join + levenshtein) on
  * every input shape — common-prefix entity strings, short/gram-less
  * strings, nulls — because exactness is the whole point of the design
  * (completeness proof in the [[graft.llm.Fuzzy]] scaladoc). */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def brute(df: DataFrame, idCol: String, strCol: String,
      d: Int): Set[(Long, Long, Long)] = {
    val s = df.select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
    s.select(col("id").as("id_a"), col("s").as("sa"))
      .crossJoin(s.select(col("id").as("id_b"), col("s").as("sb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb")).cast("long"))
      .filter(col("dist") <= d)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)]
      .collect().toSet
  }

  private def blocked(df: DataFrame, idCol: String, strCol: String,
      d: Int, q: Int): Set[(Long, Long, Long)] =
    Fuzzy.editDistanceJoin(df, idCol, strCol, d, q)
      .as[(Long, Long, Long)].collect().toSet

  private def deletes(df: DataFrame, idCol: String, strCol: String,
      d: Int): Set[(Long, Long, Long)] =
    Fuzzy.editDistanceJoinShort(df, idCol, strCol, d)
      .as[(Long, Long, Long)].collect().toSet

  test("editDistanceJoin matches brute force on common-prefix entity strings") {
    val c = spark.read.parquet(s"$sfDir/customer.parquet").limit(150)
    assert(blocked(c, "c_custkey", "c_name", 1, 3) ===
      brute(c, "c_custkey", "c_name", 1))
    assert(blocked(c, "c_custkey", "c_name", 2, 3) ===
      brute(c, "c_custkey", "c_name", 2))
  }

  test("editDistanceJoinShort matches brute force and the gram path") {
    val c = spark.read.parquet(s"$sfDir/customer.parquet").limit(150)
    for (d <- Seq(1, 2)) {
      val b = brute(c, "c_custkey", "c_name", d)
      assert(deletes(c, "c_custkey", "c_name", d) === b, s"d=$d vs brute")
      assert(blocked(c, "c_custkey", "c_name", d, 3) === b, s"d=$d regimes agree")
    }
    // the gram-poor shapes exercise the short path's pure-deletion cases
    val df = Seq((0L, "a"), (1L, ""), (2L, "ab"), (3L, "ba"), (4L, "same"),
      (5L, "sane"), (6L, "aaaaaaaaaa"), (7L, "aaaabaaaaa")).toDF("id", "s")
    for (d <- Seq(1, 2))
      assert(deletes(df, "id", "s", d) === brute(df, "id", "s", d), s"d=$d")
  }

  test("editDistanceJoin matches brute force across gram widths") {
    val p = spark.read.parquet(s"$sfDir/part.parquet")
      .groupBy("p_name").agg(min("p_partkey").as("rep_id"))
    for (q <- Seq(2, 3, 4))
      assert(blocked(p, "rep_id", "p_name", 2, q) ===
        brute(p, "rep_id", "p_name", 2), s"q=$q")
  }

  test("gram-poor strings route through the sentinel bucket") {
    // short (gram-less), barely-grammed, and LONG-but-repetitive strings —
    // the three ways a gram set fits inside the q·d destroy budget
    val df = Seq((0L, "a"), (1L, "b"), (2L, "ab"), (3L, "abc"), (4L, "abcd"),
      (5L, "xy"), (6L, "xyz"), (7L, ""), (8L, "abcdefgh"),
      (9L, "same"), (10L, "sane"), // disjoint gram sets at distance 1
      (11L, "aaaaaaaaaa"), (12L, "aaaabaaaaa"), (13L, "aaaaaaaaab"))
      .toDF("id", "s")
    for (d <- Seq(1, 2))
      assert(blocked(df, "id", "s", d, 3) === brute(df, "id", "s", d), s"d=$d")
  }

  test("null strings pair with nothing and do not throw") {
    val df = Seq((0L, "alpha"), (1L, null), (2L, "alphb"))
      .toDF("id", "s")
    assert(blocked(df, "id", "s", 1, 3) === Set((0L, 2L, 1L)))
  }

  test("identical strings are distance-0 pairs") {
    val df = Seq((0L, "same"), (1L, "same"), (2L, "sane")).toDF("id", "s")
    assert(blocked(df, "id", "s", 1, 3) ===
      Set((0L, 1L, 0L), (0L, 2L, 1L), (1L, 2L, 1L)))
  }

  test("fuzzyClusters closes typo chains and keeps singletons canonical") {
    val df = Seq((10L, "gradient"), (11L, "gradiant"), (12L, "gradiunt"),
      (20L, "optimizer"), (30L, "zebra")).toDF("id", "s")
    // 10~11 (1 sub), 11~12 (1 sub) chain transitively; 12 is 2 from 10
    val out = Fuzzy.fuzzyClusters(df, "id", "s", maxDist = 1)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out === Set((10L, 10L, true), (11L, 10L, false), (12L, 10L, false),
      (20L, 20L, true), (30L, 30L, true)))
  }
}
