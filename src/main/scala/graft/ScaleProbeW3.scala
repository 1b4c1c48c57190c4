package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused factor sweep for the round-14 kernels: VP8L decode+dHash
  * (all six bitstream shapes) and the wiki multistream slice path —
  * index parse → slim slice rows → Hadoop RANGED reads off one on-disk
  * dump file, one task per slice. The slice probe is the point of
  * VERDICT r13 task 5: the wall should track pages/streams, not the
  * dump's monolithic size, because no task ever holds the whole file.
  *
  *   java -cp ... graft.ScaleProbeW3 /root/testdata/sf0.1 1 4 10
  */
object ScaleProbeW3 {

  private def time[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  /** The q_multimodal_webp_dhash fixture shape, probe-sized. */
  private[graft] def probeWebpMedia(id: Long): graft.llm.Multimodal.Media = {
    val w = 18; val h = 16
    val gray = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (((id % 40) * 31 + x * 7 + y * 13) % 176).toInt
    }
    graft.llm.Multimodal.Media(id,
      graft.llm.Vp8l.syntheticWebpGray(w, h, gray, (id % 6).toInt), "image/webp")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 10)
    val spark = SparkSession.builder()
      .appName("graft-scale-probe-w3")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      import spark.implicits._
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
      for (f <- factors) {
        val ids = (0 until f).map(i =>
            docs0.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism)
          .as[Long].persist()
        val nd = ids.count()
        def report(workload: String, sec: Double, rows: Long): Unit =
          println(s"""{"factor":$f,"docs":$nd,"workload":"$workload","sec":${math.round(sec * 1000) / 1000.0},"rows":$rows}""")

        // VP8L: encode-in-fixture + full pixel decode + dHash, pure map
        val (tWp, nWp) = time(
          graft.llm.Multimodal.imageDHash(ids.map(probeWebpMedia _))
            .filter(col("ok")).agg(count(col("dhash"))).head.getLong(0))
        report("webp_vp8l_dhash", tWp, nWp)

        // wiki slices: ONE on-disk multistream dump of 60*f streams /
        // 300*f pages; slim slice rows fan out to ranged-read tasks
        val pages = (0 until 300 * f).map(i =>
          (s"P $i", 0, i.toLong, "", s"probe body $i " + ("w " * 40)))
        val (dumpB, indexB) = graft.llm.Wiki.syntheticMultistreamIndexed(pages, 60 * f)
        val file = java.io.File.createTempFile("graft-probe-ms", ".xml.bz2")
        file.deleteOnExit()
        java.nio.file.Files.write(file.toPath, dumpB)
        val path = file.getAbsolutePath
        val src = Seq(graft.llm.Wiki.WikiIndexSrc(0L, indexB, dumpB.length.toLong)).toDS()
        val (tSl, nSl) = time {
          val slices = graft.llm.Wiki.indexSlices(src).map(s => (s, path))
            .repartition(spark.sparkContext.defaultParallelism)
          graft.llm.Wiki.slicePagesFs(slices).agg(count(col("page_id"))).head.getLong(0)
        }
        report("wiki_slice_ranged_decode", tSl, nSl)
        file.delete()
        ids.unpersist(blocking = false)
      }
    } finally spark.stop()
  }
}
