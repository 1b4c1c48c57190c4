package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused diagnostic for the as-of hot-key pair: synthetic tick frames
  * (half of all rows on ONE key) at an env-tunable row count and bucket
  * width, timing the plain window form against the bucketed form. Exists
  * because the full ScaleProbe can only afford one size point; this is
  * the tool for mapping WHERE the bucketed form's crossover sits.
  *
  *   SPARK_GRAFT_ASOF_ROWS=20000000 SPARK_GRAFT_ASOF_WIDTH=1000000 \
  *     java -cp ... graft.AsofProbe
  */
object AsofProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_ASOF_ROWS", "20000000").toLong
    val width = sys.env.getOrElse("SPARK_GRAFT_ASOF_WIDTH", "1000000").toLong
    val span = 100000000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      def ticks(mult: Long, payload: String) = spark.range(n).select(
        when(pmod(col("id"), lit(2)) === 0, lit(0L))
          .otherwise(pmod(col("id"), lit(64))).as("k"),
        pmod(col("id") * mult, lit(span)).as("t"),
        col("id").as(payload))
      val l = ticks(7919L, "lv").persist()
      val r = ticks(104729L, "rv").persist()
      l.count(); r.count()
      def t[A](tag: String)(body: => A): Unit = {
        val t0 = System.nanoTime()
        val res = body
        println(f"[asof] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($res)")
      }
      // warm both plan shapes once at 1/100 scale so Janino lands off-clock
      val lw = l.limit(200000); val rw = r.limit(200000)
      graft.ops.Temporal.asofJoin(lw, rw, Seq("k"), "t").agg(count(col("r_rv"))).head
      graft.ops.Temporal.asofJoinBucketed(lw, rw, Seq("k"), "t", width).agg(count(col("r_rv"))).head
      for (rep <- 1 to sys.env.getOrElse("SPARK_GRAFT_ASOF_REPS", "2").toInt) {
        t(s"plain rep$rep")(
          graft.ops.Temporal.asofJoin(l, r, Seq("k"), "t")
            .agg(count(col("r_rv"))).head.getLong(0))
        t(s"bucketed w=$width rep$rep")(
          graft.ops.Temporal.asofJoinBucketed(l, r, Seq("k"), "t", width)
            .agg(count(col("r_rv"))).head.getLong(0))
      }
    } finally spark.stop()
  }
}
