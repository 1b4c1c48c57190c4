package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused factor sweep for the round-15 second wave: CDX indexing
  * (gzip member walk + SURT + sha256 digests), revisit dedup (the one
  * shuffle that follows it), the WHT spectral audio fingerprint, the
  * global-structure image wHash, and bitext margin mining. The decode
  * kernels are pure map stages, so wall should track the corpus
  * factor; revisit dedup adds one hash shuffle of slim index rows;
  * bitext is quadratic in the CORPUS SLICES by design at probe scale
  * (the brute baseline — the lists it consumes come from LSH/IVF at
  * real scale), so its sweep holds the slice sizes constant and scales
  * only the count of independent mining jobs.
  *
  *   java -cp ... graft.ScaleProbeW5 /root/testdata/sf0.1 1 4 10
  */
object ScaleProbeW5 {

  private def time[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  /** The q_warc_cdx fixture shape, probe-sized. */
  private[graft] def probeCdxMedia(id: Long): graft.llm.Multimodal.Media = {
    val recs = (0 until (2 + id % 2).toInt).map { i =>
      val port = if (i % 2 == 0) ":80" else ":8080"
      (s"HTTP://WwW.Ex$id.ORG$port/P$id/$i?b=2&a=$id#f",
        f"2026-08-${1 + (id + i) % 28}%02dT${id % 24}%02d:${(i * 7) % 60}%02d:${(id + i) % 60}%02dZ",
        s"<p>cdx ${(id + i) % 4}</p>")
    }
    graft.llm.Multimodal.Media(id,
      graft.llm.Warc.syntheticWarcDated(recs, gzipped = id % 2 == 0),
      "application/warc")
  }

  /** Walsh-tone audio, the q_audio_spectral shape. */
  private[graft] def probeSpectralMedia(id: Long): graft.llm.Multimodal.Media = {
    val frames = (4 + id % 3).toInt
    val samples = new Array[Int](frames * 64)
    var n = 0
    while (n < frames) {
      val k = (1 + (id + 3 * n) % 33).toInt
      val a = (50 + 10 * ((id + n) % 5)).toInt
      var j = 0
      while (j < 64) {
        samples(n * 64 + j) =
          if (java.lang.Integer.bitCount(k & j) % 2 == 0) a else -a
        j += 1
      }
      n += 1
    }
    graft.llm.Multimodal.Media(id,
      graft.llm.Multimodal.syntheticWavPcm(8000, samples), "audio/wav")
  }

  /** Deterministic dense BMP, the imageWHash worst case (every
    * coefficient nonzero, median load-bearing). */
  private[graft] def probeWhashMedia(id: Long): graft.llm.Multimodal.Media =
    graft.llm.Multimodal.Media(id, graft.llm.Multimodal.syntheticBmp8(32, 32,
      Array.tabulate(1024)(i => ((i * 11 + id.toInt * 7 + (i / 32) * 3) % 200))),
      "image/bmp")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 10)
    val spark = SparkSession.builder()
      .appName("graft-scale-probe-w5")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      import spark.implicits._
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding").persist()
      emb.count()
      for (f <- factors) {
        val ids = (0 until f).map(i => docs0.select(
            (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism)
          .persist()
          .as[Long]
        val nd = ids.count()
        def report(workload: String, sec: Double, rows: Long): Unit =
          println(s"""{"factor":$f,"docs":$nd,"workload":"$workload","sec":${math.round(sec * 1000) / 1000.0},"rows":$rows}""")

        val (tCdx, nCdx) = time(
          graft.llm.Warc.cdxRecords(ids.map(probeCdxMedia _))
            .agg(count(col("digest"))).head.getLong(0))
        report("cdx_index", tCdx, nCdx)

        val (tRv, nRv) = time(
          graft.llm.Warc.revisitDedup(
              graft.llm.Warc.cdxRecords(ids.map(probeCdxMedia _)).toDF()
                .filter(col("rec_type") === "response"))
            .agg(sum(col("keep"))).head.getLong(0))
        report("cdx_revisit_dedup", tRv, nRv)

        val (tSp, nSp) = time(
          graft.llm.AudioStats.spectralFingerprint(ids.map(probeSpectralMedia _))
            .agg(count(col("hash32"))).head.getLong(0))
        report("audio_spectral", tSp, nSp)

        val (tWh, nWh) = time(
          graft.llm.Multimodal.imageWHash(ids.map(probeWhashMedia _))
            .filter(col("ok")).agg(count(col("dhash"))).head.getLong(0))
        report("image_whash", tWh, nWh)

        // ranged fetch: the archive GROWS with the factor but the
        // wanted subset stays CONSTANT (100 captures) — the timed
        // region is the SEEK+PARSE path alone (archive synthesis and
        // the file install stay outside, the bench-hygiene rule), and
        // wall must be flat in archive size: the entire point of
        // carrying a CDX index instead of scanning
        val fetchRecs = (0 until 500 * f).map(i =>
          (s"http://fp.net/p$i", "2026-08-01T00:00:00Z",
            s"<p>f $i ${"pad " * 20}</p>"))
        val fetchArc = graft.llm.Warc.syntheticWarcDated(fetchRecs, gzipped = true)
        val fetchTmp = java.io.File.createTempFile("graft_w5_fetch", ".warc.gz")
        java.nio.file.Files.write(fetchTmp.toPath, fetchArc)
        val fetchWanted = graft.llm.Warc.cdxIndex(fetchArc)
          .filter(r => r.rec_type == "response")
          .take(100)
          .map(r => (r, fetchTmp.getAbsolutePath))
        val fetchDs = spark.createDataset(fetchWanted)(
          org.apache.spark.sql.Encoders.product[(graft.llm.Warc.CdxRow, String)])
          .repartition(8)
        val (tFe, nFe) = time(
          graft.llm.Warc.fetchRecords(fetchDs)
            .agg(count(col("payload"))).head.getLong(0))
        fetchTmp.delete()
        report("cdx_ranged_fetch_const_subset", tFe, nFe)

        // f independent mining jobs over the constant embedding slices:
        // the per-job cost is fixed, so wall should track f like the
        // map kernels — what scales in a real pipeline is the number of
        // (shard × shard) candidate jobs the LSH/IVF lists feed
        val (tBx, nBx) = time {
          (0 until f).map { _ =>
            graft.llm.Bitext.marginPairs(
              emb.filter(col("vec_id") % 2 === 0),
              emb.filter(col("vec_id") % 2 === 1),
              "vec_id", "embedding", k = 4)
              .agg(count(col("margin"))).head.getLong(0)
          }.sum
        }
        report("bitext_margin", tBx, nBx)

        ids.unpersist(blocking = false)
      }
    } finally spark.stop()
  }
}
