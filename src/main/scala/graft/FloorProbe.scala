package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Diagnostic-only (not part of the driver contract): decomposes the
  * per-query fixed cost ("floor") that dominates the suite total once the
  * heavy queries are tuned — 289 of 319 bench queries run sub-second and
  * together account for ~73% of the suite (r15 opt continuation baseline).
  *
  * For each named query it reports, per rep:
  *   build  = Scala-side DataFrame construction (query wiring, fixture memo)
  *   plan   = analysis + optimization + physical planning (executedPlan)
  *   exec   = the noop-sink action (jobs/stages/tasks + summed task time)
  * so floor work can be attributed to the driver's plan pipeline vs job
  * scheduling vs genuine task compute. Usage:
  *   FloorProbe q_a,q_b [reps] [sfDir] [cpus]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 4
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 3) args(3) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskNs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskMetrics != null) taskNs.addAndGet(e.taskMetrics.executorRunTime * 1000000L)
      }
    })
    // session warmup (same rationale as Bench)
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      var r = 0
      while (r < reps) {
        jobs.set(0); stages.set(0); tasks.set(0); taskNs.set(0)
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        // force analysis/optimization/physical planning without execution
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        Thread.sleep(300) // drain listener events
        println(f"[floor] $name%s rep ${r + 1}: build=${(t1 - t0) / 1e3}%.0f us " +
          f"plan=${(t2 - t1) / 1e3}%.0f us exec=${(t3 - t2) / 1e3}%.0f us " +
          f"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
          f"task_time=${taskNs.get / 1e6}%.0f ms")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        r += 1
      }
    }
    spark.stop()
  }
}
