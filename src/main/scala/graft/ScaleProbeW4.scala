package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused factor sweep for the round-15 kernels: composite-font PDF
  * text (ToUnicode CMap decode), the modern ObjStm/XRef layout and the
  * widened filter chains, charset-resolved WARC ingestion, and the
  * stupid-backoff order-3 LM. Every decode is a pure map stage, so the
  * wall should track the corpus factor; the LM's reference model is
  * held CONSTANT across factors (the CCNet premise — a curated,
  * bounded reference), so its train cost amortizes and the scoring
  * scan is the corpus-linear part.
  *
  *   java -cp ... graft.ScaleProbeW4 /root/testdata/sf0.1 1 4 10
  */
object ScaleProbeW4 {

  private def time[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  /** The q_pdf_text_cid fixture shape, probe-sized. */
  private[graft] def probeCidMedia(id: Long): graft.llm.Multimodal.Media = {
    val specials = (id % 3) match {
      case 0 => Seq(0x0001, 0x0099)
      case 1 => Seq(0x0002, 0x0010, 0x0011, 0x0012)
      case _ => Seq(0x0003)
    }
    graft.llm.Multimodal.Media(id,
      graft.llm.Pdf.syntheticCidPdf("1.6", s"Cid D$id body words here",
        specials, s"a=${id % 13}".getBytes("ISO-8859-1"),
        splitTj = id % 2 == 1, flateCmap = id % 2 == 0),
      "application/pdf")
  }

  /** The q_pdf_text_objstm / q_pdf_text_filters shapes, interleaved. */
  private[graft] def probeModernPdfMedia(id: Long): graft.llm.Multimodal.Media = {
    val lines = (0 until 3).map(j => s"L$j D$id (k=${(id + j) % 31}) zzzzz run")
    val bytes =
      if (id % 2 == 0)
        graft.llm.Pdf.syntheticObjStmPdf("1.7", lines,
          flateObjStm = id % 4 == 0, flateContent = id % 4 == 2)
      else graft.llm.Pdf.syntheticFilterPdf("1.4", lines, ((id - 1) / 2 % 6).toInt)
    graft.llm.Multimodal.Media(id, bytes, "application/pdf")
  }

  /** The q_warc_charset fixture shape, probe-sized (seven resolution
    * paths per archive, bodies byte-exact). */
  private[graft] def probeCharsetMedia(id: Long): graft.llm.Multimodal.Media = {
    def iso(s: String) = s.getBytes("ISO-8859-1")
    def b(xs: Int*) = xs.map(_.toByte).toArray
    val recs = Seq(
      (s"http://p/$id/1", "text/html; charset=windows-1252", iso(s"w$id ") ++ b(0x93, 0xE9, 0x94)),
      (s"http://p/$id/2", "text/html", iso("<meta charset=shift_jis>") ++ "日本語".getBytes("Shift_JIS")),
      (s"http://p/$id/3", "text/html", b(0xEF, 0xBB, 0xBF) ++ s"b$id é…".getBytes("UTF-8")),
      (s"http://p/$id/4", "text/html", iso(s"f$id ") ++ b(0x80, 0x99)),
      (s"http://p/$id/5", "text/html", s"u$id é€".getBytes("UTF-8")),
      (s"http://p/$id/6", "text/html", b(0xFF, 0xFE) ++ s"s$id".getBytes("UTF-16LE")),
      (s"http://p/$id/7", "text/html; charset=iso-8859-1", iso(s"l$id ") ++ b(0x85)))
    graft.llm.Multimodal.Media(id,
      graft.llm.Warc.syntheticWarcRaw(recs, gzipped = id % 2 == 0),
      "application/warc")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 10)
    val spark = SparkSession.builder()
      .appName("graft-scale-probe-w4")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      import spark.implicits._
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
      // the LM reference stays the UNREPLICATED %5 slice at every factor
      val reference = docs0.filter(col("doc_id") % 5 === 0).persist()
      reference.count()
      for (f <- factors) {
        val docs = (0 until f).map(i => docs0.select(
            (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"), col("text")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism)
          .persist()
        val nd = docs.count()
        val ids = docs.select("doc_id").as[Long]
        def report(workload: String, sec: Double, rows: Long): Unit =
          println(s"""{"factor":$f,"docs":$nd,"workload":"$workload","sec":${math.round(sec * 1000) / 1000.0},"rows":$rows}""")

        val (tCid, nCid) = time(
          graft.llm.Pdf.pdfPages(ids.map(probeCidMedia _))
            .agg(count(col("text"))).head.getLong(0))
        report("pdf_cid_text", tCid, nCid)

        val (tMod, nMod) = time(
          graft.llm.Pdf.pdfPages(ids.map(probeModernPdfMedia _))
            .agg(count(col("text"))).head.getLong(0))
        report("pdf_objstm_filters_text", tMod, nMod)

        val (tWc, nWc) = time(
          graft.llm.Warc.readWarc(ids.map(probeCharsetMedia _))
            .agg(count(col("charset"))).head.getLong(0))
        report("warc_charset_ingest", tWc, nWc)

        val (tLm, nLm) = time(
          graft.llm.TextAnalysis.lmScoreBackoff(docs.toDF(), "doc_id", "text",
              reference.toDF(), "text")
            .agg(count(col("surprisal_micronats"))).head.getLong(0))
        report("lm_backoff_score", tLm, nLm)

        docs.unpersist(blocking = false)
      }
    } finally spark.stop()
  }
}
