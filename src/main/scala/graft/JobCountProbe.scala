package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Diagnostic-only (not part of the driver contract): counts jobs, stages,
  * tasks and summed task time for one query run, to locate fixed-overhead
  * hot spots in iterative operators. Usage:
  *   JobCountProbe <queryName> [sfDir] [cpus]
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // parity with Bench.scala so probed task counts match the bench session
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
    val fn = SparkEntry.queries(name)
    // warm rep (codegen etc.), then the measured rep
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    jobs.set(0); stages.set(0); tasks.set(0); taskNs.set(0)
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    // let straggler listener events drain
    Thread.sleep(500)
    println(f"[probe] $name%s wall=$dt%.2f s jobs=${jobs.get} stages=${stages.get} " +
      f"tasks=${tasks.get} sum_task_time=${taskNs.get / 1e9}%.1f s")
    spark.stop()
  }
}
