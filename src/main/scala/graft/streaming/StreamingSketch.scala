package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming cardinality profiling — the ingestion-time form of the batch
  * HLL sketch ([[graft.llm.Sketches]]): per event-time window, maintain the
  * 2^p HyperLogLog registers of a column under Structured Streaming state.
  *
  * Why this is the RIGHT streaming shape: a register is a max, and max is
  * what update-mode streaming aggregation maintains natively — no custom
  * stateful processor, no retraction problem (rho only grows). State is
  * bounded by m·(windows inside the watermark horizon) rows of (window,
  * bucket, rho) — a few KB per window REGARDLESS of stream rate, which is
  * the whole point of sketching an unbounded feed. The registers use the
  * same deterministic kernel as the batch sketch
  * ([[graft.llm.Sketches.bucketRho]]), so a window's streaming registers
  * EQUAL the batch registers of the same data (StreamingSpec asserts it),
  * and a streaming snapshot merges with batch sketches by element-wise max.
  *
  * Output (update mode): (window, bucket, rho) — downstream evaluates an
  * estimate from any window's register snapshot via
  * [[graft.llm.Sketches.estimateFromRegisters]].
  */
object StreamingSketch {

  /** Streaming windowed CMS — same argument as [[hllWindowed]] with SUM in
    * place of MAX: a Count-Min counter is a sum, and sums are native to
    * update-mode streaming aggregation (monotone under append, no
    * retraction). State ≤ depth·width rows per window at any stream rate;
    * a window's streaming counters EQUAL the batch counters of the same
    * data (StreamingSpec asserts it) and merge with batch sketches by
    * element-wise sum — the [[graft.llm.Sketches.cmsRegisters]] merge law. */
  def cmsWindowed(df: DataFrame, tsCol: String, valueCol: String,
      windowDuration: String, delay: String, depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 16, "depth in [1,16]")
    require(width >= 2, "width >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val obs = df
      .select(col(tsCol).cast("timestamp").as("__ts"), col(valueCol).cast("string").as("__v"))
      .na.drop()
      .as[(java.sql.Timestamp, String)]
      .mapPartitions(_.flatMap { case (ts, v) =>
        val h = graft.llm.Hashing.hashString(v)
        (0 until depth).iterator.map(j =>
          (ts, j, graft.llm.Sketches.cmsPos(h, j, width)))
      })
      .toDF("__ts", "j", "pos")
    obs
      .withWatermark("__ts", delay)
      .groupBy(window(col("__ts"), windowDuration), col("j"), col("pos"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** `df` must be a streaming DataFrame with event-time `tsCol` and a
    * string `valueCol`. `delay` is the watermark, e.g. "10 seconds". */
  def hllWindowed(df: DataFrame, tsCol: String, valueCol: String,
      windowDuration: String, delay: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, "p in [4,16]")
    val spark = df.sparkSession
    import spark.implicits._
    val obs = df
      .select(col(tsCol).cast("timestamp").as("__ts"), col(valueCol).cast("string").as("__v"))
      .na.drop()
      .as[(java.sql.Timestamp, String)]
      .mapPartitions(_.map { case (ts, v) =>
        val (b, r) = graft.llm.Sketches.bucketRho(v, p)
        (ts, b, r)
      })
      .toDF("__ts", "bucket", "rho")
    obs
      .withWatermark("__ts", delay)
      .groupBy(window(col("__ts"), windowDuration), col("bucket"))
      .agg(max("rho").as("rho"))
  }
}
