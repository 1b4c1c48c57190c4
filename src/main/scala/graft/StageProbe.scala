package graft

import scala.collection.concurrent.TrieMap
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Diagnostic-only (not part of the driver contract): per-STAGE task-time
  * attribution for one query run — where [[JobCountProbe]] says "N jobs,
  * M tasks, T task-seconds", this says WHICH stage owns them, by the stage's
  * first line of its details/callSite. Usage:
  *   StageProbe <queryName> [sfDir] [cpus]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse {
      System.err.println("usage: StageProbe <queryName> [sfDir] [cpus]"); sys.exit(2)
    }
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // (stageId -> (name, tasks, taskMs, inRecs, shufReadRecs, shufWriteRecs))
    val stages = TrieMap.empty[Int, (String, Int, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
        val n = e.stageInfo.name.linesIterator.next()
        stages.put(e.stageInfo.stageId, (n, 0, 0L, 0L, 0L, 0L))
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val cur = stages.getOrElse(e.stageId, ("?", 0, 0L, 0L, 0L, 0L))
        val m = e.taskMetrics
        val (ms, in, sr, sw) =
          if (m == null) (0L, 0L, 0L, 0L)
          else (m.executorRunTime, m.inputMetrics.recordsRead,
            m.shuffleReadMetrics.recordsRead, m.shuffleWriteMetrics.recordsWritten)
        stages.put(e.stageId,
          (cur._1, cur._2 + 1, cur._3 + ms, cur._4 + in, cur._5 + sr, cur._6 + sw))
      }
    })
    val fn = SparkEntry.queries(name)
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    stages.clear()
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[stageprobe] $name%s wall=$dt%.2f s, stages by task time:")
    stages.toSeq.sortBy(-_._2._3).take(20).foreach { case (id, (n, t, ms, in, sr, sw)) =>
      println(f"[stageprobe]   stage $id%4d tasks=$t%3d task_time=${ms / 1e3}%7.2f s " +
        f"in=$in%d sread=$sr%d swrite=$sw%d  $n%s")
    }
    spark.stop()
  }
}
