package graft
import org.apache.spark.sql.SparkSession
object JobLoop {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    val rdd = sc.parallelize(1 to 1, 1).cache()
    rdd.count()
    val t0 = System.nanoTime()
    var i = 0
    while (i < 3000) { rdd.count(); i += 1 }
    println(f"per job: ${(System.nanoTime() - t0) / 3e6 / 1000}%.2f ms")
    spark.stop()
  }
}
