package graft

import org.apache.spark.sql.functions._
import graft.model.Envelope
import graft.ops.{AddOns, Functional, Shell, Skew}

/** Edge cases for the batch operator surface (boundaries the oracle queries
  * don't reach). */
class OpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val env = Envelope.fromEvents(spark, sfDir)

  test("head/tail with n larger than any partition return the whole log") {
    val total = env.count()
    assert(Shell.head(env, 1000000).count() == total)
    assert(Shell.tail(env, 1000000).count() == total)
  }

  test("grep with no match is empty; match cap via limit composes") {
    assert(Shell.grep(env, "zzz_never_matches").count() == 0)
    assert(Shell.grep(env, "\\{").limit(5).count() == 5)
  }

  test("wc on an all-tombstone log counts zero words and key-only bytes") {
    val tombs = env.withColumn("value", lit(null).cast("string"))
    val row = Shell.wc(tombs).head
    assert(row.getLong(1) == 0L) // words
    assert(row.getLong(2) > 0L)  // key bytes remain
  }

  test("asof join: inclusive boundary, latest-wins, null when nothing precedes") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 100L, "r@100"), (1L, 150L, "r@150"), (1L, 300L, "r@300"))
      .toDF("k", "t", "rv")
    val out = graft.ops.Temporal.asofJoin(left, right, Seq("k"), "t")
      .select("lv", "r_rv").as[(String, Option[String])].collect().toMap
    assert(out("p1").contains("r@100")) // equal time matches (inclusive)
    assert(out("p2").contains("r@150")) // latest preceding, not first
    assert(out("p3").isEmpty)           // nothing at or before -> null
  }

  test("asofJoinBucketed ≡ asofJoin: random data, hot key, boundary times, every width") {
    import spark.implicits._
    // deterministic pseudo-random fixture with a HOT key (key 0 carries
    // half the rows — the skew the bucketed form exists for), ties on
    // (key, time) on both sides, and times landing exactly on bucket
    // boundaries for the widths under test
    val rnd = new scala.util.Random(7)
    def gen(n: Int, tag: String) = (0 until n).map { i =>
      val k = if (rnd.nextBoolean()) 0L else 1L + rnd.nextInt(5)
      val t = rnd.nextInt(40).toLong * (if (rnd.nextBoolean()) 7L else 10L)
      (k, t, s"$tag$i")
    }
    val left = gen(120, "L").toDF("k", "t", "lv")
    // right made tie-free per (k, t) — the operator's documented
    // determinism precondition, same as the oracle fixture
    val right = gen(150, "R").toDF("k", "t", "rv")
      .groupBy("k", "t").agg(max("rv").as("rv"))
    val plain = graft.ops.Temporal.asofJoin(left, right, Seq("k"), "t")
      .select("k", "t", "lv", "r_rv").as[(Long, Long, String, Option[String])]
      .collect().sortBy(r => (r._1, r._2, r._3)).toSeq
    for (width <- Seq(1L, 7L, 10L, 70L, 1000L)) {
      val bucketed = graft.ops.Temporal.asofJoinBucketed(
          left, right, Seq("k"), "t", width)
        .select("k", "t", "lv", "r_rv").as[(Long, Long, String, Option[String])]
        .collect().sortBy(r => (r._1, r._2, r._3)).toSeq
      assert(bucketed === plain, s"width=$width diverges from asofJoin")
    }
    // asofJoinAuto dispatches by the measured rule and stays
    // result-identical in BOTH regimes: default threshold (nothing here
    // is hot → plain path) and threshold 1 (everything is hot → bucketed
    // path with a derived width)
    val autoPlain = graft.ops.Temporal.asofJoinAuto(left, right, Seq("k"), "t")
      .select("k", "t", "lv", "r_rv").as[(Long, Long, String, Option[String])]
      .collect().sortBy(r => (r._1, r._2, r._3)).toSeq
    assert(autoPlain === plain, "auto (cold histogram) diverges")
    val autoHot = graft.ops.Temporal.asofJoinAuto(left, right, Seq("k"), "t",
        hotKeyThreshold = 1L, targetBucketRows = 10L)
      .select("k", "t", "lv", "r_rv").as[(Long, Long, String, Option[String])]
      .collect().sortBy(r => (r._1, r._2, r._3)).toSeq
    assert(autoHot === plain, "auto (forced bucketed) diverges")
    // empty inputs: the histogram head() must not NPE and the result is
    // the plain form's empty left-outer frame
    val emptyAuto = graft.ops.Temporal.asofJoinAuto(
      left.limit(0), right.limit(0), Seq("k"), "t")
    assert(emptyAuto.count() == 0L)
  }

  test("interpolate join: exact hit, interior interpolation, null outside the covered range") {
    import spark.implicits._
    val left = Seq((1L, 0L, "q0"), (1L, 5L, "q5"), (1L, 10L, "q10"),
      (1L, 12L, "q12"), (1L, -1L, "qneg"), (2L, 7L, "k2q"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 0L, 10.0), (1L, 10L, 20.0), (2L, 7L, 5.5))
      .toDF("k", "t", "v")
    val out = graft.ops.Temporal.interpolateJoin(left, right, Seq("k"), "t", "v")
      .select("lv", "interp").as[(String, Option[Double])].collect().toMap
    assert(out("q0").contains(10.0))  // exact hit on the first point
    assert(out("q5").contains(15.0))  // interior: halfway between 10 and 20
    assert(out("q10").contains(20.0)) // exact hit on the last point
    assert(out("q12").isEmpty)        // after the last point: no forward bracket
    assert(out("qneg").isEmpty)       // before the first point: no backward bracket
    assert(out("k2q").contains(5.5))  // other key: its own (single) exact point
  }

  test("range join: inclusive delta, cross-bucket pairs found, no duplicates") {
    import spark.implicits._
    // t=999 and t=1001 straddle a bucket boundary at delta=1000
    val ev = Seq((1L, 10L, 0L), (2L, 10L, 999L), (3L, 10L, 1001L), (4L, 10L, 5000L))
      .toDF("id", "k", "t")
    val pairs = graft.ops.Temporal.rangeJoin(ev, ev, Seq("k"), "t", 1000L)
      .filter(col("id") < col("r_id"))
      .select("id", "r_id").as[(Long, Long)].collect().sorted.toSeq
    // (1,2): |0-999|<=1000; (1,3): |0-1001|>1000 no; (2,3): 2 <= 1000 across buckets
    assert(pairs == Seq((1L, 2L), (2L, 3L)))
  }

  test("byte sizes are UTF-8 octets, not characters") {
    import spark.implicits._
    val one = Seq(("k", "héllo")).toDF("key", "value") // é = 2 octets
    assert(Shell.wc(one).head.getAs[Long]("bytes") == 1L + 6L)
    val stats = graft.ops.AddOns.messageSizeStats(one).head
    assert(stats.getAs[Long]("total_bytes") == 7L)
    assert(stats.getAs[Long]("max_bytes") == 7L)
  }

  test("exact quantiles: rank selection on a known distribution, duplicates, edges") {
    import spark.implicits._
    import graft.ops.AddOns
    // values 1..100 each once: 0-based rank floor(99·p) → value rank+1:
    // p50 → rank 49 → 50; p99 → rank floor(98.01)=98 → 99; p1.0 → rank 99 → 100
    val u = (1 to 100).toDF("v")
    val q1 = AddOns.quantilesExact(u, col("v"), Seq(0.0, 0.5, 0.9, 0.99, 1.0))
      .as[(Double, Long)].collect().toMap
    assert(q1 == Map(0.0 -> 1L, 0.5 -> 50L, 0.9 -> 90L, 0.99 -> 99L, 1.0 -> 100L))
    // heavy duplicates: 90×10, 9×100, 1×1000 → p50 in the 10-bucket,
    // p95 in the 100-bucket, p100 = 1000
    val skew = (Seq.fill(90)(10) ++ Seq.fill(9)(100) ++ Seq(1000)).toDF("v")
    val q2 = AddOns.quantilesExact(skew, col("v"), Seq(0.5, 0.95, 1.0))
      .as[(Double, Long)].collect().toMap
    assert(q2 == Map(0.5 -> 10L, 0.95 -> 100L, 1.0 -> 1000L))
  }

  test("exact quantiles ignore nulls; grouped form keeps the NULL group") {
    import spark.implicits._
    import graft.ops.AddOns
    // nulls must not shift ranks: p50 of {10,20,30} is 20 regardless of nulls
    val withNulls = Seq[Option[Int]](None, Some(10), Some(20), Some(30))
      .toDF("v")
    val q = AddOns.quantilesExact(withNulls, col("v"), Seq(0.5))
      .as[(Double, Long)].collect().toMap
    assert(q == Map(0.5 -> 20L))
    // a NULL group value is a real group, not silently dropped
    val g = Seq((Some("a"), 1), (Some("a"), 3), (None, 7), (None, 9))
      .toDF("g", "v")
    val qg = AddOns.quantilesExactBy(g, "g", col("v"), Seq(1.0))
      .as[(Option[String], Double, Long)].collect().toSet
    assert(qg == Set((Some("a"), 1.0, 3L), (None, 1.0, 9L)))
  }

  test("exact quantiles match the sort-based definition on seeded random data") {
    import spark.implicits._
    import graft.ops.AddOns
    val rnd = new scala.util.Random(42)
    val vals = Array.fill(997)(rnd.nextInt(50)) // heavy duplicates by design
    val probs = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = AddOns.quantilesExact(vals.toSeq.toDF("v"), col("v"), probs)
      .as[(Double, Long)].collect().toMap
    val sorted = vals.sorted
    val expected = probs.map(p =>
      p -> sorted(math.floor((vals.length - 1) * p).toInt).toLong).toMap
    assert(got == expected)
  }

  test("grouped exact quantiles: independent per-group selection") {
    import spark.implicits._
    import graft.ops.AddOns
    val two = ((1 to 100).map(v => ("a", v)) ++ Seq(("b", 7), ("b", 7), ("b", 9)))
      .toDF("g", "v")
    val q = AddOns.quantilesExactBy(two, "g", col("v"), Seq(0.5, 1.0))
      .as[(String, Double, Long)].collect().toSet
    // group a = uniform 1..100; group b = {7,7,9}: p50 rank floor(2·0.5)=1 → 7
    assert(q == Set(("a", 0.5, 50L), ("a", 1.0, 100L), ("b", 0.5, 7L), ("b", 1.0, 9L)))
  }

  test("distributed foldl equals the sequential fold") {
    val ds = spark.range(1, 1001).as[Long]
    val distributed = Functional.foldl(ds)(0L)(_ + _, _ + _)
    assert(distributed == (1L to 1000L).foldLeft(0L)(_ + _))
  }

  test("compact of an empty log is empty; of a single key keeps the last") {
    assert(AddOns.compact(env.limit(0)).count() == 0)
    val one = Seq(("k", "v1", 0, 0L), ("k", "v2", 0, 1L))
      .toDF("key", "value", "partition", "offset")
      .withColumn("timestamp", lit(new java.sql.Timestamp(0)))
    val res = AddOns.compact(one).select("value").as[String].collect()
    assert(res.toSeq == Seq("v2"))
  }

  test("salted aggregation equals plain aggregation on skewed data") {
    // 90% of rows on one key — the case salting exists for
    val skewed = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, "hot").otherwise(concat(lit("k"), col("id"))).as("k"),
        col("id").as("v"))
    val plain = skewed.groupBy("k").agg(sum("v").as("s"))
      .as[(String, Long)].collect().toSet
    val salted = Skew.saltedSum(skewed, Seq("k"), col("v"), "s", 8)
      .as[(String, Long)].collect().toSet
    assert(plain == salted)
  }

  test("salting is retry-stable (content-derived) and exact on duplicate-heavy data") {
    // 10k identical rows share a salt bucket BY DESIGN (map-side partial
    // aggregation collapses them before the shuffle; a position-derived
    // salt would be retry-nondeterministic — SPARK-23207 class)
    val dupes = spark.range(10000).select(lit("hot").as("k"), lit(1L).as("v"))
    val total = Skew.saltedSum(dupes, Seq("k"), col("v"), "s", 8).head.getLong(1)
    assert(total == 10000L)
    // determinism: same input, two runs, identical salted partials
    val p1 = dupes.withColumn("__salt", pmod(hash(col("k"), col("v")), lit(8)))
      .groupBy("__salt").count().collect().toSet
    val p2 = dupes.withColumn("__salt", pmod(hash(col("k"), col("v")), lit(8)))
      .groupBy("__salt").count().collect().toSet
    assert(p1 == p2)
  }

  test("diamond topology walks visit shared nodes once") {
    import graft.streams.{TNode, ZSet}
    // a chain of diamonds: exponential without a visited set
    var node = TNode.source("s", ZSet.fromRecords(Seq("a").toDF("k")))
    (0 until 25).foreach { _ =>
      node = node.filter(lit(true)).union(node.filter(lit(true)))
    }
    // completes instantly with the visited set; hangs for ~2^25 visits without
    assert(node.topology.nonEmpty)
    assert(node.mermaid.startsWith("graph TD"))
    node.reset()
  }

  test("head resolves against the low watermark after log truncation") {
    val fs = new graft.storage.FileStorage(spark,
      java.nio.file.Files.createTempDirectory("graft_head").toString)
    fs.createTopic("t", 1)
    fs.produce("t", (0 until 10).map(i => ("k", s"v$i",
      new java.sql.Timestamp(1700000000000L + i * 1000))).toDF("key", "value", "timestamp")
      .withColumn("partition", lit(0)))
    fs.deleteRecords("t", 6L)
    val h = Shell.head(fs.read("t"), 2).select("offset").as[Long].collect().sorted
    assert(h.toSeq == Seq(6L, 7L), s"head after truncation returned ${h.mkString(",")}")
  }

  test("differentiate . integrate round-trips (zero-init z^-1 semantics)") {
    val df = Seq((1L, "a", 5.0), (2L, "a", 3.0), (3L, "b", 7.0))
      .toDF("seq", "k", "v")
    val roundtrip = graft.streams.Linear.differentiate(
      graft.streams.Linear.integrate(df, Seq("k"), col("seq"), col("v"), "run"),
      Seq("k"), col("seq"), col("run"), "back")
      .select("seq", "back").as[(Long, Double)].collect().toMap
    assert(roundtrip == Map(1L -> 5.0, 2L -> 3.0, 3L -> 7.0))
  }

  test("cumulative window rejects a period not divisible by advance") {
    val e = intercept[IllegalArgumentException] {
      graft.streams.Windows.cumulative(
        env, Envelope.tsMs(col("ts")), periodMs = 7L * 86400000L,
        advanceMs = 2L * 86400000L, Seq(col("event_type")))(count(lit(1)).as("n"))
    }
    assert(e.getMessage.contains("multiple"))
  }

  test("diff reports one-sided rows on both sides and equal logs as empty") {
    val a = Seq((0, 0L, "k1", "v1"), (0, 1L, "k2", "v2"))
      .toDF("partition", "offset", "key", "value")
    val b = Seq((0, 1L, "k2", "v2"), (0, 2L, "k3", "v3"))
      .toDF("partition", "offset", "key", "value")
    val d = Shell.diff(a, b).select("offset", "side").as[(Long, String)].collect().toSet
    assert(d == Set((0L, "only_a"), (2L, "only_b")))
    assert(Shell.diff(a, a).count() == 0)
  }

  test("kafka-source adapter yields the canonical envelope schema") {
    val kafkaShaped = env.select(
      encode(col("key"), "UTF-8").as("key"),
      encode(col("value"), "UTF-8").as("value"),
      col("topic"), col("partition"), col("offset"),
      col("timestamp"), col("timestampType"))
    val adapted = Envelope.fromKafkaSource(kafkaShaped)
    assert(adapted.schema.fieldNames.toSeq == Envelope.columnNames)
    assert(adapted.select("value").except(env.select("value")).count() == 0)
  }

  test("pagerank: cycle is stationary at 1e6, star center dominates, hand-exact") {
    import spark.implicits._
    import graft.ops.Graphs
    // 3-cycle: outdeg 1 everywhere; share = 850000, next = 150000 + 850000
    // = 1e6 -> every iteration is a fixed point
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val rc = Graphs.pageRank(cycle, "src", "dst", iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rc == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
    // star 1->2, 3->2 (2 dangling): iter1 r(2) = 150000 + 2*850000;
    // iter2 leaves drop to 150000, so r(2) = 150000 + 2*((850000*150000)
    // div 1e6) = 150000 + 2*127500
    val star = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val rs = Graphs.pageRank(star, "src", "dst", iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rs(1L) == 150000L && rs(3L) == 150000L)
    assert(rs(2L) == 150000L + 2L * 127500L)
    // self-loops and duplicate edges are dropped before ranking
    val messy = Seq((1L, 1L), (1L, 2L), (1L, 2L), (3L, 2L)).toDF("src", "dst")
    val rm = Graphs.pageRank(messy, "src", "dst", iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rm == rs)
    // deep iteration: the in-loop localCheckpoint must keep lineage FLAT
    // in iters (not 2 joins per round) AND leave the fixed point intact —
    // the cycle is stationary at any depth, checkpointed or not. Absolute
    // plan-line counts are noisy (persisted eDeg/nodes print their whole
    // cached plan per reference), so the assertion is relative: 12 rounds
    // may not plan deeper than the 4 un-checkpointed rounds it tails with.
    val deep = Graphs.pageRank(cycle, "src", "dst", iters = 12)
    val deepLines = deep.queryExecution.optimizedPlan.toString.linesIterator.size
    val shallowLines = Graphs.pageRank(cycle, "src", "dst", iters = 4)
      .queryExecution.optimizedPlan.toString.linesIterator.size
    assert(deepLines <= shallowLines + 10,
      s"deep=$deepLines shallow=$shallowLines — checkpoint every 4 rounds should keep lineage flat in iters")
    assert(deep.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("hits: star hub/authority split is hand-exact, max-normalized to 1e6") {
    import spark.implicits._
    import graft.ops.Graphs
    // 1->2, 3->2: node 2 is the only authority (max-norm -> 1e6, hub 0);
    // 1 and 3 are equal pure hubs (1e6 each) at every iteration — the
    // exact fixed point, so iters=1 and iters=3 agree
    val star = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    for (it <- Seq(1, 3)) {
      val r = Graphs.hits(star, "src", "dst", iters = it).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(r == Map(
        1L -> ((1000000L, 0L)),
        2L -> ((0L, 1000000L)),
        3L -> ((1000000L, 0L))), s"iters=$it")
    }
    // chain 1->2->3: auth(2)=auth(3)=max -> both 1e6; hub(1)=hub(2)=max
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val rc = Graphs.hits(chain, "src", "dst", iters = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rc == Map(
      1L -> ((1000000L, 0L)),
      2L -> ((1000000L, 1000000L)),
      3L -> ((0L, 1000000L))))
  }

  test("rademacher projection: hand-replayed signs, zero for null, determinism") {
    import spark.implicits._
    import graft.llm.{Embeddings, Hashing}
    val df = Seq(
      (1L, Array(0.5f, -1.25f, 2.0f)),
      (2L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    val out = Embeddings.projectRademacher(df, "vec_id", "embedding", 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val q = Array(524288L, -1310720L, 2097152L) // floor(e*2^20)
    val expected = (0 until 4).map { j =>
      (0 until 3).map(i => Hashing.planeSign(j, i) * q(i)).sum
    }.toArray
    assert(out(1L).toSeq == expected.toSeq)
    assert(out(2L).toSeq == Seq(0L, 0L, 0L, 0L))
    // same inputs under a different partitioning -> identical integers
    val out2 = Embeddings.projectRademacher(df.repartition(7), "vec_id", "embedding", 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    assert(out2(1L).toSeq == out(1L).toSeq)
  }

  test("z-order interleave: hand-computed bits, and 2-D file envelopes prune where 1-D cannot") {
    import spark.implicits._
    import graft.functions.ZOrder
    // x=0b101, y=0b011 -> x bits at even positions (1+0+16), y at odd (2+8)
    val hand = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y"), 3).as("z"))
      .head().getLong(0)
    assert(hand == 27L)
    // the layout claim, in exact arithmetic (no sampled partitioner): a
    // 64x64 grid cut into 16 z-contiguous "files" of 256 rows each gives
    // every file a 16x16 envelope in BOTH dims, so a y-only band predicate
    // touches 4/16 files — while an x-sorted layout leaves every file
    // spanning all of y and prunes nothing
    val grid = spark.range(4096).select(
      (col("id") % 64).as("x"), expr("id div 64").as("y"))
    val z = grid.withColumn("z", ZOrder.interleave(col("x"), col("y"), 6))
    val zFiles = z.withColumn("f", expr("z div 256"))
      .groupBy("f").agg(min("y").as("ymin"), max("y").as("ymax"))
    assert(zFiles.count() == 16)
    assert(zFiles.filter(col("ymin") < 8).count() == 4)
    val xFiles = grid.withColumn("f", expr("x div 16")) // 4 files sorted by x
      .groupBy("f").agg(min("y").as("ymin"), max("y").as("ymax"))
    assert(xFiles.filter(col("ymin") < 8).count() == xFiles.count())
    // round-trip: z is injective on the bounded domain
    assert(z.select(countDistinct("z")).head().getLong(0) == 4096L)
  }
}
