package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.{Ann, Dedup, Ivf, Pq}

/** Scale-up probe behind SCALING.md's measured table: replicates the sf0.1
  * documents/embeddings corpora N× (ids offset per copy, text perturbed so
  * cross-copy pairs are NEAR-dups, not exact dups) and times the dedup/ANN
  * paths whose scaling curve the design claims. Re-run after any change to
  * those operators:
  *
  *   java -cp ... graft.ScaleProbe /root/testdata/sf0.1 1 4 10
  *
  * Prints one JSON line per (factor, workload). Timings are end-to-end
  * action times (count or small collect), not plan-build times.
  */
object ScaleProbe {

  private def time[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  private def replicateDocs(docs: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { i =>
      docs.select(
        (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
        // perturb every copy differently: cross-copy pairs stay near-dup
        concat(col("text"), lit(" variant" + i)).as("text"))
    }.reduce(_ unionByName _)

  private def replicateEmbs(embs: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { i =>
      embs.select(
        (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
        col("embedding"))
    }.reduce(_ unionByName _)

  // Planted-twin MEDIA generators for the round-11 media curves: the
  // local id (id % 1e6) keys the same pseudorandom content in EVERY
  // replica copy, and the copy index perturbs one corner block / first
  // audio frame / one video frame — so cross-copy twins sit at Hamming
  // ≤ 1 (resp. share ≥ 11 of 12 frame hashes) and pair volume grows
  // ~C(f,2)·|locals| with the factor while unrelated locals (pseudo-
  // random splitmix content) almost never collide. Rendering the real
  // BMP/WAV/Y4M container is PART of the timed map stage, exactly like
  // decode — bytes never shuffle either way.
  private def probeImageMedia(id: Long): graft.llm.Multimodal.Media = {
    import graft.llm.{Hashing, Multimodal}
    val local = id % 1000000L
    val variant = ((id / 1000000L) % 3L).toInt
    val w = 18; val h = 16
    val gray = Array.tabulate(w * h) { i =>
      val base = (Hashing.splitmix64(local * 288L + i) & 0x7FL).toInt
      val delta = if (i % w < 2 && i / w < 2) variant * 40 else 0
      base + delta
    }
    Multimodal.Media(id, Multimodal.syntheticBmpPixels(w, h, gray), "image/bmp")
  }

  private def probeAudioMedia(id: Long): graft.llm.Multimodal.Media = {
    import graft.llm.{Hashing, Multimodal}
    val local = id % 1000000L
    val variant = ((id / 1000000L) % 3L).toInt
    val samples = Array.tabulate(1950) { j =>
      val s = (((Hashing.splitmix64(local * 1950L + j) % 4001L) + 4001L) % 4001L - 2000L).toInt
      if (j < 30) s + variant * 500 else s
    }
    Multimodal.Media(id, Multimodal.syntheticWavPcm(8000, samples), "audio/wav")
  }

  private def probeVideoMedia(id: Long): graft.llm.Multimodal.Media = {
    import graft.llm.{Hashing, Multimodal}
    val local = id % 1000000L
    val variant = ((id / 1000000L) % 3L).toInt
    val w = 18; val h = 16
    val frames = (0 until 12).map { f =>
      Array.tabulate(w * h) { i =>
        val base = (Hashing.splitmix64((local * 12L + f) * 288L + i) & 0x7FL).toInt
        val delta = if (f == variant * 4 && i % w < 2 && i / w < 2) 40 else 0
        base + delta
      }
    }
    Multimodal.Media(id, Multimodal.syntheticY4m(w, h, frames), "video/x-yuv4mpeg")
  }

  // Round-12 codec-wave fixtures: the same planted-twin content rendered
  // through the EXPENSIVE decode paths the r11 wave added (PNG inflate,
  // GIF LZW, baseline + progressive JPEG, TIFF-LZW, FLAC, IMA/MS ADPCM,
  // G.711, AIFF/AU). These rows time the HASH MAP STAGE only — the
  // decode claim under test is per-row CPU, flat across the decade,
  // with zero shuffle growth (the pair math is already pinned by the
  // lossless rows above). Image content is block-constant so JPEG stays
  // DC-dominated; the coded-formula G.711 paths are stateless decodes
  // where formula bytes are safe.
  private def probeImageCrossMedia(id: Long): graft.llm.Multimodal.Media = {
    import graft.llm.{Hashing, Multimodal, Tiff}
    val local = id % 1000000L
    val variant = ((id / 1000000L) % 3L).toInt
    val w = 24; val h = 16
    val gray = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = i / w / 8
      val base = (Hashing.splitmix64(local * 6L + by * 3L + bx) & 0xBFL).toInt
      if (bx == 0 && by == 0) base + variant * 12 else base
    }
    (local % 6) match {
      case 0 => Multimodal.Media(id, Multimodal.syntheticBmpPixels(w, h, gray), "image/bmp")
      case 1 => Multimodal.Media(id,
        Multimodal.syntheticPngPixels(w, h, gray, colorType = 2,
          rowFilters = Seq(((local % 5) + 1).toInt % 5, (local % 5).toInt)), "image/png")
      case 2 => Multimodal.Media(id,
        Multimodal.syntheticGifPixels(w, h, gray, interlaced = local % 4 == 2), "image/gif")
      case 3 => Multimodal.Media(id, Multimodal.syntheticJpegPixels(w, h, gray), "image/jpeg")
      case 4 => Multimodal.Media(id,
        Tiff.syntheticTiffPixels(w, h, gray, compression = 5, predictor = 2,
          rowsPerStrip = 6, bigEndian = local % 2 == 0), "image/tiff")
      case _ => Multimodal.Media(id,
        Multimodal.syntheticJpegProgressive(w, h, gray), "image/jpeg")
    }
  }

  private def probeAudioCrossMedia(id: Long): graft.llm.Multimodal.Media = {
    import graft.llm.{Flac, Hashing, Multimodal}
    val local = id % 1000000L
    val variant = ((id / 1000000L) % 3L).toInt
    val samples = Array.tabulate(1950) { j =>
      val s = (((Hashing.splitmix64(local * 1950L + j) % 4001L) + 4001L) % 4001L - 2000L).toInt
      if (j < 30) s + variant * 500 else s
    }
    def codedBytes(n: Int): Array[Byte] =
      Array.tabulate[Byte](n)(j => (Hashing.splitmix64(local * 31L + j) & 0xFFL).toByte)
    (local % 8) match {
      case 0 => Multimodal.Media(id, Multimodal.syntheticWavPcm(8000, samples), "audio/wav")
      case 1 => Multimodal.Media(id, Multimodal.syntheticWav(8000, samples, "float32"), "audio/wav")
      case 2 => Multimodal.Media(id,
        Flac.synthetic(8000, samples, blockSize = 256, strategy = "fixed2"), "audio/flac")
      case 3 => Multimodal.Media(id, Multimodal.syntheticAiff(8000, samples), "audio/aiff")
      case 4 => Multimodal.Media(id,
        Multimodal.syntheticAu(8000, if (local % 2 == 0) 1 else 27, codedBytes(1950)),
        "audio/basic")
      case 5 => Multimodal.Media(id,
        Multimodal.syntheticWavG711(8000, if (local % 2 == 0) 6 else 7, codedBytes(1950)),
        "audio/wav")
      case 6 => Multimodal.Media(id,
        Multimodal.syntheticWavAdpcm(8000, 1, samples, blockAlign = 256), "audio/wav")
      case _ => Multimodal.Media(id,
        Multimodal.syntheticWavAdpcmMs(8000, 1, samples), "audio/wav")
    }
  }

  private def probeVideoCrossMedia(id: Long): graft.llm.Multimodal.Media = {
    import graft.llm.{Hashing, Multimodal}
    val local = id % 1000000L
    val variant = ((id / 1000000L) % 3L).toInt
    val w = 18; val h = 16
    val frames = (0 until 12).map { f =>
      Array.tabulate(w * h) { i =>
        val base = (Hashing.splitmix64((local * 12L + f) * 288L + i) & 0x7FL).toInt
        if (f == variant * 4 && i % w < 2 && i / w < 2) base + 40 else base
      }
    }
    if (local % 2 == 0)
      Multimodal.Media(id, Multimodal.syntheticY4m(w, h, frames), "video/x-yuv4mpeg")
    else if (local % 4 == 1)
      Multimodal.Media(id, Multimodal.syntheticGifAnimated(w, h, frames), "video/gif")
    else {
      // DELTA-encoded GIF (round 12): keyframe + sub-rect deltas, so the
      // probe times the COMPOSITOR chain path, not just per-frame LZW
      val deltas = (0, 0, w, h, frames.head.map(v => v min 254), 0) +:
        (1 until frames.size).map { f =>
          (4, 3, 8, 6, Array.tabulate(48) { i =>
            frames(f)((3 + i / 8) * w + (4 + i % 8)) min 254
          }, 0)
        }
      Multimodal.Media(id, Multimodal.syntheticGifAnimatedDeltas(w, h, deltas), "video/gif")
    }
  }

  // Round-13 ADVERSARIAL compositor shape: the r12 delta probe used short
  // chains; this one is built to hit the documented worst case head-on —
  // EVERY frame after the keyframe is a sub-rect delta (so no chain-skip
  // anchor exists past frame 0), disposal-3 on every other frame (each
  // one costs a full-canvas snapshot + restore), and sparse sampling
  // (sampleFrames=4) whose last sample sits at the chain TAIL. The
  // compositor walks the needed-set union forward ONCE, so per-video CPU
  // must be ∝ total frames (one decode each + the snapshot copies), NOT
  // ∝ samples × chain length — the chain24 vs chain96 pair at the same
  // corpus factor pins the linear-in-duration bound with data.
  private def probeVideoAdversarialMedia(nFrames: Int)(id: Long): graft.llm.Multimodal.Media = {
    import graft.llm.{Hashing, Multimodal}
    val local = id % 1000000L
    val w = 18; val h = 16
    val key = Array.tabulate(w * h)(i => (Hashing.splitmix64(local * 288L + i) & 0x7FL).toInt)
    val deltas = (0, 0, w, h, key, 0) +: (1 until nFrames).map { f =>
      (4, 3, 8, 6, Array.tabulate(48) { i =>
        (Hashing.splitmix64((local * nFrames + f) * 48L + i) & 0x7FL).toInt
      }, if (f % 2 == 0) 3 else 0)
    }
    Multimodal.Media(id, Multimodal.syntheticGifAnimatedDeltas(w, h, deltas), "video/gif")
  }

  // Round-13 admission-layer probes: the structural container walks and
  // WARC ingestion are pure map/flatMap kernels, so the expectation is
  // wall-clock linear in corpus size with no shuffle; rendering the
  // synthetic container inside the timed map stands in for scan I/O.
  private def probeWebpMedia(id: Long): graft.llm.Multimodal.Media = {
    val fmt = Seq("lossy", "lossless", "extended")((id % 3).toInt)
    graft.llm.Multimodal.Media(id, graft.llm.Containers.syntheticWebp(
      fmt, (64 + id % 300).toInt, (48 + id % 200).toInt,
      alpha = fmt != "lossy" && id % 2 == 0,
      animFrames = if (fmt == "extended" && id % 4 == 2) 3 else 0,
      frameLen = i => (40 + (id + i) % 60).toInt, fillLen = (200 + id % 99).toInt,
      alphaLen = 30, exifLen = if (id % 5 == 0) 25 else 0), "image/webp")
  }
  private def probeMkvMedia(id: Long): graft.llm.Multimodal.Media =
    graft.llm.Multimodal.Media(id, graft.llm.Containers.syntheticMkv(
      (320 + id % 640).toInt, (180 + id % 360).toInt,
      durationTicks = (300 + id % 400).toDouble, timestampScale = 1000000L,
      writeScale = id % 7 != 0, audioTrack = id % 3 == 0, swapOrder = id % 6 == 3,
      nClusters = (2 + id % 3).toInt, blocksPerCluster = ci => (2 + (id + ci) % 3).toInt,
      blockLen = (ci, j) => (30 + (id + ci * 5 + j * 3) % 60).toInt,
      videoCodec = "V_VP9",
      segSizeMode = if (id % 5 == 2) 1 else if (id % 5 == 3) 2 else 0), "video/webm")
  private def probeWarcMedia(id: Long): graft.llm.Multimodal.Media = {
    // ~2 KB html bodies: a realistic page-weight stand-in so the timed
    // row includes gunzip + header walk + extraction over real volume
    val filler = ("<p>" + ("lorem ipsum dolor sit amet " * 12) + "</p>") * 6
    graft.llm.Multimodal.Media(id, graft.llm.Warc.syntheticWarc(
      nResponses = 3,
      uri = i => s"https://probe/$id/$i",
      status = i => if ((id + i) % 4 == 0) (404, "Not Found") else (200, "OK"),
      htmlBody = i => s"<html><head><title>P$id-$i</title><script>var x=1;" +
        s"</script></head><body><h1>H ${(id + i) % 97}</h1>$filler</body></html>",
      gzipped = id % 2 == 1, withRequests = id % 3 == 0,
      lowerCaseHeaders = false, infoLen = 20), "application/warc")
  }

  // round-13 document-router probe: one blob per doc cycling the seven
  // router formats, bodies sized like short real documents (the pdf
  // slice renders 3 flate-compressed pages so the inflate path is in
  // the timed stage).
  private def probeDocMedia(id: Long): graft.llm.Multimodal.Media = {
    import graft.llm.{Docs, Hashing, Mail, Pdf}
    val local = id % 1000000L
    def para(j: Int): String = (0 until 30).map(w =>
      s"w${Hashing.splitmix64(local * 53L + j * 7L + w) & 0xFFL}").mkString(" ")
    val bytes: Array[Byte] = (local % 7L).toInt match {
      case 0 => Pdf.syntheticPdf("1.5", p => Seq(para(p), para(p + 3)), 3,
        (local % 4L).toInt, octalAll = false, flate = _ => true, filterArray = false,
        twoStreams = _ => false, indirectLength = false, outOfOrder = false,
        nested = false, encrypted = false)
      case 1 => Docs.syntheticDocx(Seq(Seq(para(0)), Seq(para(1), para(2))),
        storedParts = local % 2 == 0)
      case 2 => Docs.syntheticEpub(
        (0 until 2).map(k => (s"c$k.xhtml", s"<html><body><p>${para(k)}</p></body></html>")),
        Seq(1, 0), None)
      case 3 => Mail.syntheticMbox(Seq(Mail.syntheticMessage(
        "a@x", "b@x c@x", s"S $local", para(0) + "\n" + para(1),
        (local % 5L).toInt, (local % 3L).toInt, foldTo = local % 2 == 0)))
      case 4 => s"<html><body><p>${para(0)}</p><p>${para(1)}</p></body></html>"
        .getBytes("UTF-8")
      case 5 => (s"\\documentclass{article}\n\\begin{document}\n\\section{${para(0).take(40)}}\n" +
        s"${para(1)}\n$$x_{$local}$$\n${para(2)}\n\\end{document}\n").getBytes("UTF-8")
      case _ =>
        val plain = s"<!DOCTYPE html><html><body><p>${para(0)}</p></body></html>"
          .getBytes("UTF-8")
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(plain); gz.close()
        bos.toByteArray
    }
    graft.llm.Multimodal.Media(id, bytes, "application/octet-stream")
  }

  // Round-13 wave 2: dump/shard ingestion + boilerplate. Bodies are
  // splitmix-worded paragraphs sized like short real records; codec
  // choice cycles per id so gzip/bz2/zstd/xz decompression is inside
  // the timed stage on its share of the corpus.
  private[graft] def probeWikiMedia(id: Long): graft.llm.Multimodal.Media = {
    val local = id % 1000000L
    def para(j: Int): String = (0 until 25).map(w =>
      s"w${graft.llm.Hashing.splitmix64(local * 31L + j * 5L + w) & 0xFFL}").mkString(" ")
    val pages = (0 until (1 + local % 3).toInt).map { j =>
      (s"P $local/$j", 0, local * 10 + j, "",
        s"== H$j ==\n'''${para(j)}''' and [[T$j|${para(j + 1).take(30)}]] {{tmpl|$j}}\n* ${para(j + 2)}\n")
    }
    graft.llm.Multimodal.Media(id,
      graft.llm.Wiki.syntheticDump(pages, (local % 3).toInt), "application/xml")
  }
  private[graft] def probeJsonlMedia(id: Long): graft.llm.Multimodal.Media = {
    val local = id % 1000000L
    val lines = (0 until 4).map { j =>
      val words = (0 until 30).map(w =>
        s"t${graft.llm.Hashing.splitmix64(local * 53L + j * 11L + w) & 0x7FL}").mkString(" ")
      s"""{"id":${local * 10 + j},"text":"$words"}"""
    }
    graft.llm.Multimodal.Media(id,
      graft.llm.Archives.syntheticJsonl(lines, (local % 5).toInt), "application/jsonl")
  }
  private[graft] def probeBoilerMedia(id: Long): graft.llm.Multimodal.Media = {
    val local = id % 1000000L
    def para(j: Int): String = (0 until 35).map(w =>
      s"w${graft.llm.Hashing.splitmix64(local * 97L + j * 13L + w) & 0xFFL}").mkString(" ")
    val html = s"<html><body><nav>" +
      (0 until 8).map(k => s"<a href='/$k'>nav $k</a>").mkString(" ") +
      "</nav>" +
      (0 until 4).map(j => s"<p>${para(j)} <a href='/x'>ref</a></p>").mkString +
      s"<div>${(0 until 6).map(k => s"<a href='/$k'>link farm $k</a>").mkString(" ")}</div>" +
      s"<footer>${para(9)}</footer></body></html>"
    graft.llm.Multimodal.Media(id, html.getBytes("UTF-8"), "text/html")
  }
  private[graft] def probeSeMedia(id: Long): graft.llm.Multimodal.Media = {
    val local = id % 1000000L
    def para(j: Int): String = (0 until 30).map(w =>
      s"w${graft.llm.Hashing.splitmix64(local * 17L + j * 3L + w) & 0xFFL}").mkString(" ")
    val rows = (0 until (2 + local % 2).toInt).map { j =>
      (local * 10 + j, 1 + (j % 2), ((local + j) % 40 - 5).toInt,
        s"T $local/$j", Seq(s"t${local % 7}"), s"<p>${para(j)}</p><p>${para(j + 1)}</p>")
    }
    graft.llm.Multimodal.Media(id,
      graft.llm.StackExchange.syntheticPosts(rows, (local % 3).toInt), "application/xml")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 10)
    val spark = SparkSession.builder()
      .appName("graft-scale-probe").master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      // NTZ-inferred parquet timestamps resolve against the session tz;
      // every graft entry point pins UTC so window epochs are tz-stable
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      // warm the iterative-graph plan shapes on an 8-edge graph (Bench's
      // posture): the loops cycle several distinct shapes per iteration
      // and their first-ever Janino compile otherwise lands on the
      // factor-1 row (r9: hits_3it read 36.7 s at 1× vs 5.3 s at 4× —
      // compilation, not the operator)
      try {
        import spark.implicits._
        val tiny = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("s", "d")
        graft.ops.Graphs.pageRank(tiny, "s", "d", iters = 2)
          .write.format("noop").mode("overwrite").save()
        graft.ops.Graphs.hits(tiny, "s", "d", iters = 2)
          .write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable =>
        System.err.println(s"[probe] warmup failed: ${e.getMessage}") }
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      val embs0 = spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")
      // cross-workload hygiene, the Bench r9/r10 lesson applied to the
      // probe: operator-internal persists and loop checkpoints that
      // outlive their workload pile up across the ~30 workloads of a
      // factor and tax whatever runs late in the JVM (pre-fix the factor-
      // 10 tail read 30-60 s on workloads whose 4x time was 1-2 s —
      // block-manager residue, not operator scaling). `kept` holds the
      // probe's own deliberately-shared frames (docs/embs/index/codes);
      // everything else unpersists the moment its workload reports.
      var kept: Set[Int] = Set.empty
      def keepCurrent(): Unit =
        kept = spark.sparkContext.getPersistentRDDs.keys.toSet
      var nReports = 0
      for (f <- factors) {
        val docs = replicateDocs(docs0, f).persist()
        val embs = replicateEmbs(embs0, f).persist()
        val (nd, ne) = (docs.count(), embs.count())
        keepCurrent()
        def report(workload: String, sec: Double, rows: Long): Unit = {
          println(s"""{"factor":$f,"docs":$nd,"vecs":$ne,"workload":"$workload","sec":${math.round(sec * 1000) / 1000.0},"rows":$rows}""")
          spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
            if (!kept.contains(id)) rdd.unpersist(blocking = false)
          }
          nReports += 1
          // periodic full GC drains the ContextCleaner's weak-ref queue
          // (shuffle files, broadcasts) before the old gen fills
          if (nReports % 8 == 0) System.gc()
        }
        val (tMh, nMh) = time(Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.3).count())
        report("minhash_pairs", tMh, nMh)
        val (tSh, nSh) = time(Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 10).count())
        report("simhash_pairs", tSh, nSh)
        val qFew = embs.filter(col("vec_id") < 10)
        val (tLshW, nLshW) = time(Ann.lshTopK(embs, qFew, "vec_id", "embedding", 10).count())
        report("ann_lsh_window_10q", tLshW, nLshW)
        val qMany = embs.filter(col("vec_id") % 37 === 0) // ~2.7% of corpus as queries
        val (tLshA, nLshA) = time(Ann.lshTopKAgg(embs, qMany, "vec_id", "embedding", 10).count())
        report("ann_lsh_agg_manyq", tLshA, nLshA)
        val (tIvf, (cents, indexed)) = time {
          val c = Ivf.train(embs, k = 16, iters = 2)
          val ix = Ivf.index(embs, c).persist()
          ix.count()
          (c, ix)
        }
        keepCurrent() // the index feeds the search workloads below
        report("ivf_train_index", tIvf, indexed.count())
        val (tIvfA, nIvfA) = time(
          Ivf.searchAgg(indexed, cents, qMany, k = 10, nprobe = 4).count())
        report("ivf_searchagg_manyq", tIvfA, nIvfA)
        // round-5 operators: duplicate-cluster contraction over the pair
        // graph, PQ train+encode, and the IVF-PQ composed search
        val (tCc, nCc) = time {
          val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.3)
            .select("id_a", "id_b")
          Dedup.clusters(docs, "doc_id", pairs).filter(col("is_canonical")).count()
        }
        report("dedup_cluster_canonical", tCc, nCc)
        val (tPq, encoded) = time {
          val cb = Pq.train(embs, m = 8, ksub = 8, iters = 2)
          val enc = Pq.encode(embs, cb, 8, 8).persist()
          enc.count()
          (cb, enc)
        }
        keepCurrent() // the code table feeds the ADC workload below
        report("pq_train_encode", tPq, encoded._2.count())
        val (tAdc, nAdc) = time(
          Pq.searchIvfAdc(encoded._2.join(indexed.select("vec_id", "list_id"), Seq("vec_id")),
            cents, encoded._1, qMany, 8, 8, 10, nprobe = 4).count())
        report("ivfpq_searchadc_manyq", tAdc, nAdc)
        // round-6 operators: repeated spans (replicated corpus = worst case,
        // every doc repeats across copies), domain caps (50 synthetic hot
        // domains, bounded output), LM scoring vs a FIXED reference (the
        // realistic shape: the LM never grows with the corpus)
        val (tSp, nSp) = time(Dedup.repeatedSpans(docs, "doc_id", "text", k = 13).count())
        report("repeated_spans", tSp, nSp)
        // round-8: the spans APPLIED — adds the per-doc span-array join-back
        // (text crosses the wire once) and the cut kernel on top of the
        // discovery pipeline; replicated corpus = worst case (every doc is
        // near-fully covered, maximal removal work)
        val (tScr, nScr) = time {
          Dedup.scrubRepeatedSpans(docs, "doc_id", "text", k = 13)
            .agg(sum("removed_tokens")).head()
          nd
        }
        report("scrub_repeated_spans", tScr, nScr)
        val withDom = docs.withColumn("dom", pmod(col("doc_id"), lit(50)))
        val (tCap, nCap) = time(
          graft.llm.Sampling.capPerDomain(withDom, "doc_id", "dom", 100).count())
        report("domain_cap100", tCap, nCap)
        val lmRef = docs0.filter(col("doc_id") % 5 === 0)
        val (tLm, nLm) = time(
          graft.llm.TextAnalysis.lmScore(docs, "doc_id", "text", lmRef, "text").count())
        report("lm_score_fixed_ref", tLm, nLm)
        // round-6 wave 2: sketching, membership, sharding, sub-doc dedup,
        // snapshot diffing — each should be flat-to-linear in corpus size
        val (tHll, nHll) = time(graft.llm.Sketches.hllRegisters(docs, "text", p = 8).count())
        report("hll_registers", tHll, nHll)
        val blockRef = docs0.filter(col("doc_id") % 11 === 0) // fixed reference
        val (tBl, nBl) = time {
          val f = graft.llm.Bloom.build(blockRef, "text", bits = 1 << 20, k = 3)
          graft.llm.Bloom.probe(docs, "doc_id", "text", f, k = 3)
            .filter(col("maybe_member")).count()
        }
        report("bloom_build_probe", tBl, nBl)
        val (tShf, nShf) = time(
          graft.llm.Sampling.shuffleShards(docs, "doc_id", nShards = 32).count())
        report("shuffle_shards32", tShf, nShf)
        val paraDocs = docs.withColumn("text",
          expr("""array_join(transform(
            |  sequence(0, greatest((size(split(text, ' ')) + 7) div 8, 1) - 1),
            |  i -> array_join(slice(split(text, ' '), CAST(i * 8 + 1 AS INT), 8), ' ')), '\n\n')""".stripMargin))
        val (tPara, nPara) = time(
          Dedup.dedupParagraphs(paraDocs, "doc_id", "text").filter(col("n_kept") > 0).count())
        report("paragraph_dedup", tPara, nPara)
        val newSnap = docs.filter(col("doc_id") % 7 =!= 3)
        val (tDiff, nDiff) = time(
          graft.llm.Snapshot.corpusDiff(docs, newSnap, "doc_id", "text")
            .groupBy("status").count().count())
        report("corpus_diff", tDiff, nDiff)
        val benchFix = docs0.filter(col("doc_id") % 37 === 0)
          .select(expr("array_join(slice(split(text, ' '), 11, 30), ' ')").as("text"))
        val (tDb, nDb) = time(
          Dedup.decontaminateBloom(docs, "doc_id", "text", benchFix, "text",
            k = 13, bloomBits = 1 << 20, bloomK = 3)
            .filter(col("contaminated")).count())
        report("decontaminate_bloom", tDb, nDb)
        val terms = docs.selectExpr("explode(split(lower(text), ' ')) AS term")
        val (tHh, nHh) = time(
          graft.llm.Sketches.heavyHitters(terms, "term", threshold = 1000L,
            depth = 4, width = 1024).count())
        report("heavy_hitters_cms", tHh, nHh)
        // round-6 wave 3: retrieval + selection operators. Fixed query /
        // target / model sides (the realistic shape — the corpus grows,
        // the trusted sets don't); scoring should scale linearly.
        val bmQ = docs0.filter(col("doc_id") % 170 === 0)
          .select(col("doc_id").as("q_id"),
            expr("array_join(slice(split(text, ' '), 3, 10), ' ')").as("q_text"))
        val (tBm, nBm) = time(
          graft.llm.TextAnalysis.bm25TopK(docs, "doc_id", "text",
            bmQ, "q_id", "q_text", topK = 5).count())
        report("bm25_fixed_queries", tBm, nBm)
        val dsirTarget = docs0.filter(col("doc_id") % 7 === 0)
        val (tDw, nDw) = time(
          graft.llm.Sampling.dsirWeights(docs, "doc_id", "text",
            dsirTarget, "text", buckets = 1024).count())
        report("dsir_weights_fixed_target", tDw, nDw)
        val (tNb, nNb) = time(
          graft.llm.QualityClassifier.nbQualityFilter(docs, "doc_id", "text",
            dsirTarget, "text", docs0.filter(col("doc_id") % 7 =!= 0), "text",
            buckets = 1024).filter(col("keep")).count())
        report("nb_quality_fixed_model", tNb, nNb)
        val (tSd, nSd) = time(
          Dedup.semanticDedup(embs, "vec_id", "embedding",
            threshold = 0.3, k = 16, iters = 2).filter(col("is_canonical")).count())
        report("semdedup_canonical", tSd, nSd)
        // round-9: the iterative graph ops on a replicated link graph.
        // Each copy is a self-contained subgraph (3 deterministic
        // within-copy out-links per doc: dst = copyBase + (local·31 + c)
        // mod |copy|), so edges AND nodes grow linearly with the factor —
        // per-iteration shuffle volume is the linear-growth worst case
        // while iteration count stays fixed, which is exactly the curve
        // the SCALING.md rows claim (2 keyed shuffles per pageRank iter,
        // 2 per HITS half-iteration, lineage capped by localCheckpoint).
        val nd0 = docs0.count()
        val copyBase = (col("doc_id").cast("long") / 1000000L).cast("long") * 1000000L
        val localId = pmod(col("doc_id"), lit(1000000L))
        val linkEdges = docs.select(col("doc_id").as("src"),
            explode(array((1 to 3).map(c =>
              copyBase + pmod(localId * 31L + lit(c.toLong * 7L + 1L), lit(nd0))): _*))
              .as("dst"))
        val (tPr, nPr) = time(
          graft.ops.Graphs.pageRank(linkEdges, "src", "dst", iters = 5).count())
        report("pagerank_5it", tPr, nPr)
        val (tHt, nHt) = time(
          graft.ops.Graphs.hits(linkEdges, "src", "dst", iters = 3).count())
        report("hits_3it", tHt, nHt)
        // round-9: the edit-distance join family on a replicated entity
        // keyspace (sequential low-entropy names — the deletion-
        // neighborhood regime). Cross-copy names DO pair (the offset digit
        // is one substitution away), so pairs grow ~linearly-with-constant
        // per copy AND every copy chains into ONE giant component — the
        // worst case for both candidate volume and the CC closure.
        val names = docs.select(col("doc_id").as("ent_id"),
          format_string("Entity#%09d", col("doc_id")).as("name"))
        val (tFz, nFz) = time(
          graft.llm.Fuzzy.editDistanceJoinShort(names, "ent_id", "name", 1).count())
        report("fuzzy_join_d1", tFz, nFz)
        val (tFc, nFc) = time(
          graft.llm.Fuzzy.fuzzyClusters(names, "ent_id", "name",
            maxDist = 1, shortStrings = true).filter(col("is_canonical")).count())
        report("fuzzy_cluster_canonical", tFc, nFc)
        // round-11: the media near-dup family. Decode+hash is a pure map
        // stage (media bytes never shuffle; rendering the synthetic
        // container is part of the timed map, standing in for decode
        // I/O); candidates ride the banded-Hamming join (image/audio)
        // resp. the frame-hash equi-join with the blank-frame bucket cap
        // (video), so join fanout is the planted C(f,2)-per-local twins
        // plus rare splitmix accidents — never all-pairs.
        locally {
          import spark.implicits._
          val mediaIds = docs.select(col("doc_id")).as[Long]
          val (tIm, nIm) = time(
            graft.llm.Multimodal.imageNearDupPairs(
              mediaIds.map(probeImageMedia _), maxHamming = 2).count())
          report("image_neardup_pairs", tIm, nIm)
          val (tAu, nAu) = time(
            graft.llm.Multimodal.audioNearDupPairs(
              mediaIds.map(probeAudioMedia _), maxHamming = 2).count())
          report("audio_neardup_pairs", tAu, nAu)
          val (tVi, nVi) = time(
            graft.llm.Multimodal.videoNearDupPairs(
              mediaIds.map(probeVideoMedia _), sampleFrames = 12, minShared = 8).count())
          report("video_neardup_pairs", tVi, nVi)
          // the q_pipeline_media composition: decode → hash → pairs →
          // transitive clusters → canonical, ONE plan; the CC closure
          // moves 16-byte edges only
          val (tMp, nMp) = time {
            val pairs = graft.llm.Multimodal.imageNearDupPairs(
                mediaIds.map(probeImageMedia _), maxHamming = 2)
              .select("id_a", "id_b")
            Dedup.clusters(docs.select(col("doc_id")), "doc_id", pairs)
              .filter(col("is_canonical")).count()
          }
          report("media_pipeline_canonical", tMp, nMp)
          // round-12: the codec-wave decode CPU rows — hash stage only,
          // aggregated on the hash column (a bare count() can't prune a
          // typed map, but the forcing is uniform with the as-of lesson)
          val (tIc, nIc) = time(
            graft.llm.Multimodal.imageDHash(mediaIds.map(probeImageCrossMedia _))
              .agg(count(col("dhash"))).head.getLong(0))
          report("image_hash_cross_container6", tIc, nIc)
          val (tAc, nAc) = time(
            graft.llm.Multimodal.audioEnvelopeHash(mediaIds.map(probeAudioCrossMedia _))
              .agg(count(col("dhash"))).head.getLong(0))
          report("audio_hash_cross_encoding8", tAc, nAc)
          val (tVc, nVc) = time(
            graft.llm.Multimodal.videoFrameHashes(mediaIds.map(probeVideoCrossMedia _),
              sampleFrames = 12).agg(count(col("dhash"))).head.getLong(0))
          report("video_hash_cross_container2", tVc, nVc)
          // round-13: adversarial compositor chains (see the generator's
          // comment) on a quarter corpus, two chain lengths — the pair's
          // ratio pins CPU ∝ total frames, the factor sweep pins
          // linear-in-corpus
          val quarterIds = mediaIds.filter(_ % 4 == 0)
          val (tA24, nA24) = time(
            graft.llm.Multimodal.videoFrameHashes(
              quarterIds.map(probeVideoAdversarialMedia(24) _), sampleFrames = 4)
              .agg(count(col("dhash"))).head.getLong(0))
          report("video_gif_adversarial_chain24", tA24, nA24)
          val (tA96, nA96) = time(
            graft.llm.Multimodal.videoFrameHashes(
              quarterIds.map(probeVideoAdversarialMedia(96) _), sampleFrames = 4)
              .agg(count(col("dhash"))).head.getLong(0))
          report("video_gif_adversarial_chain96", tA96, nA96)
          // round-13: admission walks + WARC ingest/extract — the count
          // aggregates a parsed column so the typed map can't be pruned
          val (tWp, nWp) = time(
            graft.llm.Containers.decodeWebpMeta(mediaIds.map(probeWebpMedia _))
              .agg(count(col("width"))).head.getLong(0))
          report("webp_meta_walk", tWp, nWp)
          val (tMk, nMk) = time(
            graft.llm.Containers.decodeMkvMeta(mediaIds.map(probeMkvMedia _))
              .agg(count(col("duration_ms"))).head.getLong(0))
          report("mkv_meta_walk", tMk, nMk)
          val (tWr, nWr) = time(
            graft.llm.Warc.readWarc(mediaIds.map(probeWarcMedia _))
              .agg(count(col("content_length"))).head.getLong(0))
          report("warc_ingest_records", tWr, nWr)
          val (tWh, nWh) = time(
            graft.llm.Warc.htmlTextRecords(mediaIds.map(probeWarcMedia _))
              .toDF("doc_id", "rec_idx", "text")
              .agg(count(col("text"))).head.getLong(0))
          report("warc_html_extract", tWh, nWh)
          // round-13: the heterogeneous document router — detect +
          // extract across all seven formats in one flatMap; the count
          // aggregates the extracted text so nothing prunes away. The
          // pdf slice is the CPU-heavy one (3 flate pages per doc).
          val (tDr, nDr) = time(
            graft.llm.Docs.routedTexts(mediaIds.map(probeDocMedia _))
              .toDF("doc_id", "format", "text")
              .agg(count(col("text"))).head.getLong(0))
          report("doc_router_extract", tDr, nDr)
          // round-13 wave 2: dump/shard ingestion and the boilerplate
          // classifier — all pure flatMap kernels whose codec slices
          // (gzip/bz2/zstd/xz per id) decompress inside the timed map;
          // counts aggregate a parsed/extracted column so nothing prunes
          val (tWk, nWk) = time(
            graft.llm.Wiki.wikiPages(mediaIds.map(probeWikiMedia _))
              .map(p => graft.llm.Wiki.wikitextToText(p.text))
              .agg(count(col("value"))).head.getLong(0))
          report("wiki_ingest_extract", tWk, nWk)
          val (tJl, nJl) = time(
            graft.llm.Archives.jsonlLines(mediaIds.map(probeJsonlMedia _))
              .agg(count(col("line"))).head.getLong(0))
          report("jsonl_shard_lines", tJl, nJl)
          val (tBp, nBp) = time(
            graft.llm.Boilerplate.htmlBlocks(mediaIds.map(probeBoilerMedia _))
              .filter(col("is_content")).agg(count(col("text"))).head.getLong(0))
          report("boilerplate_content_blocks", tBp, nBp)
          val (tSe, nSe) = time(
            graft.llm.StackExchange.posts(mediaIds.map(probeSeMedia _))
              .agg(count(col("body_text"))).head.getLong(0))
          report("stackexchange_posts", tSe, nSe)
        }
        // round-13 wave 2: PCA — the covariance pass is the corpus-linear
        // part (treeReduce of a d(d+3)/2-double accumulator); Jacobi is
        // O(d³) once on the driver, invariant in the factor
        val (tPc, nPc) = time {
          val model = graft.llm.Pca.fit(embs, "embedding")
          graft.llm.Pca.project(embs, "vec_id", "embedding", model, 2)
            .agg(count(col("pc_0"))).head.getLong(0)
        }
        report("pca_fit_project", tPc, nPc)
        // round-10: the as-of family under a HOT key — half of every
        // tick lands on key 0 (the single-instrument-with-10⁹-ticks shape
        // the asofJoin scaladoc warns about). The plain window serializes
        // key 0 into ONE task's sort; the bucketed form (width 10⁴ over a
        // fixed 10⁶ time span = 100 cuts) spreads it — the probe measures
        // exactly that divergence growing with the factor. Right-side
        // (k, t) ties only perturb WHICH equal-time payload wins, never
        // the row count the timing actions count.
        val hotK = when(pmod(col("doc_id"), lit(2)) === 0, lit(0L))
          .otherwise(pmod(col("doc_id"), lit(64)))
        val ticksL = docs.select(hotK.as("k"),
          pmod(col("doc_id") * 7919L, lit(1000000L)).as("t"),
          col("doc_id").as("lv"))
        val ticksR = docs.select(hotK.as("k"),
          pmod(col("doc_id") * 104729L, lit(1000000L)).as("t"),
          col("doc_id").as("rv"))
        // count the MATCHED column, not the rows: a bare count() lets
        // Catalyst prune the unused window/match columns and the probe
        // times a scan instead of the operator (the Bench noop-sink
        // lesson); rows = matched left rows
        val (tAsP, nAsP) = time(
          graft.ops.Temporal.asofJoin(ticksL, ticksR, Seq("k"), "t")
            .agg(count(col("r_rv"))).head.getLong(0))
        report("asof_hotkey_plain", tAsP, nAsP)
        val (tAsB, nAsB) = time(
          graft.ops.Temporal.asofJoinBucketed(ticksL, ticksR, Seq("k"), "t", 10000L)
            .agg(count(col("r_rv"))).head.getLong(0))
        report("asof_hotkey_bucketed", tAsB, nAsB)
        encoded._2.unpersist()
        indexed.unpersist()
        docs.unpersist(); embs.unpersist()
        kept = Set.empty
      }
      // XL as-of probe, factor-independent and corpus-free: the in-factor
      // pair shows parity because a few-hundred-thousand-row hot key sorts
      // in one task faster than the bucket-summary pass costs. THIS is the
      // regime the bucketed form exists for: 20M ticks, HALF on one key —
      // plain asofJoin sorts 10M rows in a single task while 31 threads
      // idle; the bucketed form (width 10⁶ over a 10⁸ span = 100 cuts)
      // spreads that sort. Built from spark.range so probing the operator
      // needs no corpus replication.
      {
        val n = sys.env.getOrElse("SPARK_GRAFT_ASOF_XL_ROWS", "20000000").toLong
        def ticks(mult: Long, payload: String) = spark.range(n).select(
          when(pmod(col("id"), lit(2)) === 0, lit(0L))
            .otherwise(pmod(col("id"), lit(64))).as("k"),
          pmod(col("id") * mult, lit(100000000L)).as("t"),
          col("id").as(payload))
        val xlL = ticks(7919L, "lv").persist()
        val xlR = ticks(104729L, "rv").persist()
        val nx = xlL.count(); xlR.count()
        keepCurrent()
        // warm BOTH plan shapes at 1/100 scale first (the Bench posture):
        // each form cycles distinct window/aggregate shapes whose
        // first-ever Janino compile + first spill otherwise lands on
        // whichever timed run goes first — measured 124 s cold vs 6-8 s
        // warm on the bucketed form
        val lw = xlL.limit(200000)
        val rw = xlR.limit(200000)
        graft.ops.Temporal.asofJoin(lw, rw, Seq("k"), "t")
          .agg(count(col("r_rv"))).head
        graft.ops.Temporal.asofJoinBucketed(lw, rw, Seq("k"), "t", 1000000L)
          .agg(count(col("r_rv"))).head
        def reportXl(workload: String, sec: Double, rows: Long): Unit =
          println(s"""{"factor":0,"docs":$nx,"vecs":0,"workload":"$workload","sec":${math.round(sec * 1000) / 1000.0},"rows":$rows}""")
        // same matched-column forcing as the in-factor pair: bare count()
        // would prune the window and time a scan
        val (tP, nP) = time(
          graft.ops.Temporal.asofJoin(xlL, xlR, Seq("k"), "t")
            .agg(count(col("r_rv"))).head.getLong(0))
        reportXl("asof_hotkey_xl_plain", tP, nP)
        val (tB, nB) = time(
          graft.ops.Temporal.asofJoinBucketed(xlL, xlR, Seq("k"), "t", 1000000L)
            .agg(count(col("r_rv"))).head.getLong(0))
        reportXl("asof_hotkey_xl_bucketed", tB, nB)
        xlL.unpersist(); xlR.unpersist()
      }
    } finally spark.stop()
  }
}
