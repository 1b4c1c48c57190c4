package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Diagnostic-only: dump `.explain("formatted")` of named queries to files
  * (the plans/r15 evidence artifacts). Usage:
  *   PlanDump <outDir> <query>[,<query>...] [sfDir] [cpus]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args(1).split(",")
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 3) args(3) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"$n.txt"), plan.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/$n.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
