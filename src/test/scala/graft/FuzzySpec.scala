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

  test("supplementary-plane text: blocking units match the code-point metric") {
    // each emoji is TWO UTF-16 code units but ONE code point — Spark's
    // levenshtein counts code points, so unit-based blocking would both
    // shred grams across surrogate halves and inflate the length filter
    // (r9 advice finding). Pairs here differ by exactly one code-point
    // edit INSIDE emoji runs; both regimes must agree with brute force.
    val df = Seq(
      (0L, "😀😁😂🤣😃😄😅😆😉😊"), // 10 cp / 20 units
      (1L, "😀😁😂🤣😃😄😅😆😉😋"), // 1 substitution from 0
      (2L, "😀😁😂🤣😃😄😅😆😉"),   // 1 deletion from 0
      (3L, "x😀y😁z"),             // mixed BMP + supplementary
      (4L, "x😀y😂z"),             // 1 substitution from 3
      (5L, "plain ascii row"),
      (6L, "𝕳𝖊𝖑𝖑𝖔 world"),      // math-bold (all supplementary)
      (7L, "𝕳𝖊𝖑𝖑𝖔 worlds")).toDF("id", "s")
    for (d <- Seq(1, 2)) {
      val b = brute(df, "id", "s", d)
      assert(blocked(df, "id", "s", d, 3) === b, s"gram path d=$d")
      assert(deletes(df, "id", "s", d) === b, s"deletion path d=$d")
    }
  }

  test("BandedLevenshtein kernel == Spark levenshtein(a, b, d), including -1") {
    // the r16 verify tail computes the distance in a typed kernel (one
    // evaluation per pair instead of the join-residual + projection double
    // eval) — this pins the kernel to the engine expression it replaced,
    // over every shape class: ASCII, equal, empty, len-diff > d, band
    // early-exit, non-ASCII, supplementary plane, adjacent transposition
    // (costs 2 in plain levenshtein), and long strings near the bound.
    val cases = Seq(
      ("", ""), ("", "a"), ("a", ""), ("abc", "abc"),
      ("abc", "abd"), ("abc", "abcd"), ("abcd", "abc"), ("abc", "acb"),
      ("kitten", "sitting"), ("flaw", "lawn"),
      ("Customer#000014999", "Customer#000014998"),
      ("Customer#000014999", "Customer#00001499"),
      ("aaaaaaaaaa", "bbbbbbbbbb"), ("abcdefghij", "jihgfedcba"),
      ("x😀y😁z", "x😀y😂z"), ("😀😁😂", "😀😂"), ("𝕳𝖊𝖑𝖑𝖔", "𝕳𝖊𝖑𝖑o"),
      ("ab" * 40, "ba" * 40), ("ab" * 40, "ab" * 39 + "aa"),
      ("left", "completely-unrelated-string"))
    val pairs = cases.map { case (a, b) => (a, b) } ++ cases.map { case (a, b) => (b, a) }
    for (d <- 1 to 3) {
      val lev = new Fuzzy.BandedLevenshtein(d)
      val df = pairs.toDF("a", "b")
        .withColumn("expected", levenshtein(col("a"), col("b"), d))
        .collect()
      for (r <- df) {
        val (a, b, exp) = (r.getString(0), r.getString(1), r.getInt(2))
        assert(lev.dist(a, b) === exp, s"d=$d a='$a' b='$b'")
      }
    }
  }

  test("book-length strings: gram path stays correct with the bounded prefix agg") {
    // ~40k-char documents (far beyond any sane entity key) through the
    // gram path: the rarest-k aggregator's buffer is structurally capped
    // at q·d+1, so this must complete without building document-sized agg
    // rows AND still match brute force (one pair differs by 2 edits, one
    // is unrelated)
    val base = (0 until 1500).map(i => s"sentence $i of the long document. ").mkString
    val df = Seq((0L, base), (1L, base.replace("sentence 17 ", "sentense 17x")),
      (2L, base.reverse)).toDF("id", "s")
    // thresholded all-pairs reference: the unthresholded DP is O(n²) per
    // pair at this length; the banded form is the same metric
    val s = df.select(col("id"), col("s"))
    val ref = s.select(col("id").as("id_a"), col("s").as("sa"))
      .crossJoin(s.select(col("id").as("id_b"), col("s").as("sb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb"), 2).cast("long"))
      .filter(col("dist") >= 0)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(ref === Set((0L, 1L, 2L))) // the fixture means what it claims
    assert(blocked(df, "id", "s", 2, 3) === ref)
  }

  test("RarestGramsAgg buffer never exceeds k through reduce or merge") {
    val agg = new graft.llm.Fuzzy.RarestGramsAgg(7)
    var buf = agg.zero
    val rnd = new scala.util.Random(42)
    (0 until 10000).foreach { i =>
      buf = agg.reduce(buf, (rnd.nextInt(1000).toLong, s"g$i"))
      assert(buf.length <= 7, s"reduce step $i grew past k")
    }
    var m = agg.zero
    (0 until 50).foreach { _ =>
      var other = agg.zero
      (0 until 40).foreach(j => other = agg.reduce(other, (rnd.nextInt(100).toLong, s"m$j")))
      m = agg.merge(m, other)
      assert(m.length <= 7, "merge grew past k")
    }
    // and the kept set is the true min-k under the (count, gram) order
    val elems = (0 until 100).map(i => ((i * 37 % 50).toLong, s"e$i"))
    var b2 = agg.zero
    elems.foreach(e => b2 = agg.reduce(b2, e))
    val expect = elems.sortBy { case (c, g) => (c, g) }.take(7).map(_._2)
    assert(agg.finish(b2) === expect)
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
