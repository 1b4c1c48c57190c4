package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused factor sweep for the round-13 wave-2 ingestion/curation
  * kernels (wiki dump, jsonl shards, boilerplate, stack exchange, PCA)
  * — the same replicate-and-time harness as [[ScaleProbe]] without the
  * ~35 other workloads, so the new rows can be re-measured in minutes
  * after a kernel change:
  *
  *   java -cp ... graft.ScaleProbeW2 /root/testdata/sf0.1 1 4 10
  */
object ScaleProbeW2 {

  private def time[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 10)
    val spark = SparkSession.builder()
      .appName("graft-scale-probe-w2")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      import spark.implicits._
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
      val embs0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding")
      for (f <- factors) {
        val ids = (0 until f).map(i =>
            docs0.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id")))
          .reduce(_ unionByName _)
          .repartition(spark.sparkContext.defaultParallelism)
          .as[Long].persist()
        val embs = (0 until f).map(i =>
            embs0.select((col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
              col("embedding")))
          .reduce(_ unionByName _).persist()
        val (nd, ne) = (ids.count(), embs.count())
        def report(workload: String, sec: Double, rows: Long): Unit =
          println(s"""{"factor":$f,"docs":$nd,"vecs":$ne,"workload":"$workload","sec":${math.round(sec * 1000) / 1000.0},"rows":$rows}""")
        val (tWk, nWk) = time(
          graft.llm.Wiki.wikiPages(ids.map(ScaleProbe.probeWikiMedia _))
            .map(p => graft.llm.Wiki.wikitextToText(p.text))
            .agg(count(col("value"))).head.getLong(0))
        report("wiki_ingest_extract", tWk, nWk)
        val (tJl, nJl) = time(
          graft.llm.Archives.jsonlLines(ids.map(ScaleProbe.probeJsonlMedia _))
            .agg(count(col("line"))).head.getLong(0))
        report("jsonl_shard_lines", tJl, nJl)
        val (tBp, nBp) = time(
          graft.llm.Boilerplate.htmlBlocks(ids.map(ScaleProbe.probeBoilerMedia _))
            .filter(col("is_content")).agg(count(col("text"))).head.getLong(0))
        report("boilerplate_content_blocks", tBp, nBp)
        val (tSe, nSe) = time(
          graft.llm.StackExchange.posts(ids.map(ScaleProbe.probeSeMedia _))
            .agg(count(col("body_text"))).head.getLong(0))
        report("stackexchange_posts", tSe, nSe)
        val (tPc, nPc) = time {
          val model = graft.llm.Pca.fit(embs, "embedding")
          graft.llm.Pca.project(embs, "vec_id", "embedding", model, 2)
            .agg(count(col("pc_0"))).head.getLong(0)
        }
        report("pca_fit_project", tPc, nPc)
        ids.unpersist(blocking = false)
        embs.unpersist(blocking = false)
      }
    } finally spark.stop()
  }
}
