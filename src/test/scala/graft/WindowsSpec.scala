package graft

import org.apache.spark.sql.functions._
import graft.model.Envelope
import graft.streams.{Linear, Windows}

/** Differential window tests (the reference's oracle style, SURVEY §5
  * item 4: expectations recomputed in plain Scala from the same input). */
class WindowsSpec extends SparkSpec {

  import spark.implicits._

  // deterministic synthetic stream: 200 events, 3 keys, clustered times
  private lazy val data: Seq[(String, Long)] = (0 until 200).map { i =>
    val k = s"k${i % 3}"
    // bursts with gaps: cluster index jumps 10 min every 20 events
    val t = 1700000000000L + (i / 20) * 600000L + (i % 20) * 7000L
    (k, t)
  }

  private lazy val df = data.toDF("k", "t_ms")
    .withColumn("ts", timestamp_millis(col("t_ms")))

  test("tumbling windows match a plain-Scala recomputation") {
    val got = Windows.tumbling(df, col("ts"), 60000L, Seq(col("k")))(count(lit(1)).as("n"))
      .select("window_end_ms", "k", "n").as[(Long, String, Long)].collect().toSet
    val want = data.groupBy { case (k, t) => (t / 60000 * 60000 + 60000, k) }
      .map { case ((e, k), rows) => (e, k, rows.size.toLong) }.toSet
    assert(got == want)
  }

  test("hopping windows match (every record in size/hop windows)") {
    val got = Windows.hopping(df, col("ts"), 120000L, 60000L, Seq(col("k")))(count(lit(1)).as("n"))
      .select("window_end_ms", "k", "n").as[(Long, String, Long)].collect().toSet
    val want = data.flatMap { case (k, t) =>
      Seq(1, 2).map(j => ((t / 60000 + j) * 60000, k))
    }.groupBy(identity).map { case ((e, k), rows) => (e, k, rows.size.toLong) }.toSet
    assert(got == want)
  }

  test("tumbling/session accept TIMESTAMP_NTZ input (parquet NTZ inference)") {
    // Spark 4 infers TIMESTAMP_NTZ from tz-less parquet timestamps; the
    // window()/session_window() bounds then come back NTZ, which
    // unix_millis rejects. Same recomputation as above, NTZ input column.
    val ntz = df.withColumn("ts", col("ts").cast("timestamp_ntz"))
    val got = Windows.tumbling(ntz, col("ts"), 60000L, Seq(col("k")))(count(lit(1)).as("n"))
      .select("window_end_ms", "k", "n").as[(Long, String, Long)].collect().toSet
    val want = data.groupBy { case (k, t) => (t / 60000 * 60000 + 60000, k) }
      .map { case ((e, k), rows) => (e, k, rows.size.toLong) }.toSet
    assert(got == want)
    val sess = Windows.session(ntz, col("ts"), 60000L, Seq(col("k")))(count(lit(1)).as("n"))
    assert(sess.agg(sum("n")).head.getLong(0) == data.size.toLong)
  }

  test("session windows match a gaps-and-islands recomputation") {
    val gap = 60000L
    val got = Windows.session(df, col("ts"), gap, Seq(col("k")))(count(lit(1)).as("n"))
      .select("k", "session_start_ms", "session_end_ms", "n")
      .as[(String, Long, Long, Long)].collect().toSet
    val want = data.groupBy(_._1).flatMap { case (k, rows) =>
      val ts = rows.map(_._2).sorted
      val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
        if (t - acc.head.head < gap) (t :: acc.head) :: acc.tail
        else List(t) :: acc
      }
      sessions.map(s => (k, s.min, s.max + gap, s.size.toLong))
    }.toSet
    assert(got == want)
  }

  test("cumulative windows: counts are monotone within a period") {
    val got = Windows.cumulative(df, col("t_ms"), 3600000L, 600000L, Seq(col("k")))(
      count(lit(1)).as("n"))
      .select("window_end_ms", "k", "n").as[(Long, String, Long)].collect()
    // group by (period, key): counts must be non-decreasing in window end
    got.groupBy { case (e, k, _) => ((e - 1) / 3600000L, k) }.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1).map(_._3).toSeq
      assert(sorted == sorted.sorted, s"not monotone: ${sorted.mkString(",")}")
    }
  }

  test("sliding per-record window matches a brute-force recount") {
    val size = 30000L
    val idDf = df.withColumn("id", monotonically_increasing_id())
    val got = Windows.slidingAgg(idDf, Seq("k"), Seq("id"), col("t_ms"), size, lit(1L))
      .select("id", "n_in_window").as[(Long, Long)].collect().toMap
    val ids = idDf.select("id", "k", "t_ms").as[(Long, String, Long)].collect()
    ids.foreach { case (id, k, t) =>
      val want = ids.count { case (_, k2, t2) => k2 == k && t2 >= t && t2 <= t + size }
      assert(got(id) == want.toLong, s"id=$id")
    }
  }

  test("expire keeps exactly the watermark suffix") {
    val e = Envelope.readEvents(spark, sfDir)
    val delay = 86400000L * 5
    val kept = Linear.expire(e, Envelope.tsMs(col("ts")), delay)
    val maxTs = e.agg(max(Envelope.tsMs(col("ts")))).head.getLong(0)
    assert(kept.filter(Envelope.tsMs(col("ts")) < maxTs - delay).count() == 0)
    assert(kept.count() == e.filter(Envelope.tsMs(col("ts")) >= maxTs - delay).count())
  }
}
