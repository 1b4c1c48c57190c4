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

  /** The q_multimodal_video_webp_hashes fixture shape, probe-sized. */
  private[graft] def probeWebpAnimMedia(id: Long): graft.llm.Multimodal.Media = {
    val c = (id % 40).toInt
    val f0 = Array.tabulate(18 * 16)(i => (c * 31 + (i % 18) * 7 + (i / 18) * 13) % 176)
    val f1 = Array.tabulate(8 * 6)(i => (c + (i % 8) * 11 + (i / 8) * 3) % 200)
    val f3 = Array.tabulate(4 * 4)(i => (c + (i % 4) * 9 + (i / 4) * 2) % 120)
    graft.llm.Multimodal.Media(id, graft.llm.Vp8l.syntheticWebpAnim(18, 16, 10, Seq(
      (0, 0, 18, 16, f0, 255, false, false, (id % 6).toInt),
      (4, 6, 8, 6, f1, 255, false, true, ((id + 1) % 6).toInt),
      (12, 2, 4, 4, f3, 128, true, false, 0))), "image/webp")
  }

  /** The q_audio_vad fixture shape, probe-sized (24 frames of 160). */
  private[graft] def probeVadMedia(id: Long): graft.llm.Multimodal.Media = {
    val samples = Array.tabulate(24 * 160) { j =>
      val f = j / 160
      if (((f + id) % 7 < 2) || ((f + id) % 5 == 3)) 0 else 300
    }
    graft.llm.Multimodal.Media(id,
      graft.llm.Multimodal.syntheticWavPcm(8000, samples), "audio/wav")
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

        // animated WebP: 4-frame compositor (keyframe + overwrite +
        // dispose + semi-transparent blend) per doc, per-frame hashes
        val (tAn, nAn) = time(
          graft.llm.Multimodal.videoFrameHashes(ids.map(probeWebpAnimMedia _),
              sampleFrames = 4)
            .agg(count(col("dhash"))).head.getLong(0))
        report("webp_anim_frame_hashes", tAn, nAn)

        // frame-energy VAD + ASR chunking over real WAV PCM
        val (tVd, nVd) = time(
          graft.llm.AudioStats.vadSegments(ids.map(probeVadMedia _))
            .agg(count(col("seg_idx"))).head.getLong(0))
        report("audio_vad_segments", tVd, nVd)

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
