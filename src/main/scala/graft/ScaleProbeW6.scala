package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{Ann, Hashing, Nsw, Retrieval}

/** Factor sweep for the round-15 third wave: NSW graph ANN and RRF
  * rank fusion.
  *
  * The graph probe scales the CORPUS with the factor at a constant
  * query set — build cost is the linear-ish per-partition insertion
  * pass, search is sub-linear per shard, so wall should track the
  * factor (and the brute reference at the same factors shows the
  * |corpus| × |queries| baseline it beats once shards are large).
  * The fusion probe scales the QUERY count over constant-k lists —
  * fusion rows are |queries| × k slim triples, so wall must track the
  * factor with no corpus-sized stage anywhere.
  *
  *   java -cp ... graft.ScaleProbeW6 /root/testdata/sf0.1 1 4 10
  */
object ScaleProbeW6 {

  private def time[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  /** Deterministic 64-dim pseudo-embedding (the NswSpec idiom). */
  private[graft] def probeVec(id: Long): Array[Float] =
    Array.tabulate(64)(d =>
      (Hashing.splitmix64(id * 131 + d).toDouble / Long.MaxValue.toDouble).toFloat)

  def main(args: Array[String]): Unit = {
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 10)
    val spark = SparkSession.builder()
      .appName("graft-scale-probe-w6")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      import spark.implicits._
      for (f <- factors) {
        val n = 5000L * f
        val corpus = spark.range(n).as[Long]
          .map(id => (id, probeVec(id)))
          .toDF("vec_id", "embedding")
          .repartition(8).persist()
        corpus.count()
        val queries = corpus.filter(col("vec_id") < 16)
        def report(workload: String, sec: Double, rows: Long): Unit =
          println(s"""{"factor":$f,"corpus":$n,"workload":"$workload","sec":${math.round(sec * 1000) / 1000.0},"rows":$rows}""")

        val (tG, nG) = time(
          Nsw.searchTopK(corpus, queries, "vec_id", "embedding",
              k = 10, m = 8, efConstruction = 32, ef = 64)
            .agg(count(col("nn_id"))).head.getLong(0))
        report("nsw_build_search", tG, nG)

        val (tB, nB) = time(
          Ann.bruteForceTopK(corpus, queries, "vec_id", "embedding", 10)
            .agg(count(col("nn_id"))).head.getLong(0))
        report("ann_brute_ref", tB, nB)

        // fusion input: two top-10 lists per query, ids offset so the
        // overlap (and thus the sum path) is exercised on every query
        val qn = 2500L * f
        val rankA = spark.range(qn).as[Long].flatMap(q =>
            (1 to 10).map(r => (q, (q * 7 + r) % 1000, r.toLong)))
          .toDF("q_id", "nn_id", "rank")
        val rankB = spark.range(qn).as[Long].flatMap(q =>
            (1 to 10).map(r => (q, (q * 7 + r + 5) % 1000, r.toLong)))
          .toDF("q_id", "nn_id", "rank")
        val (tR, nR) = time(
          Retrieval.rrfFuse(Seq(rankA, rankB), "q_id", "nn_id", "rank", topK = 10)
            .agg(count(col("nn_id"))).head.getLong(0))
        report("rrf_fuse", tR, nR)

        corpus.unpersist(blocking = false)
      }
    } finally spark.stop()
  }
}
