package graft.model

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Per-JVM parquet SCHEMA memo for the fixed test tables (r15 optimization,
  * guide §6 file-listing/metadata posture).
  *
  * Every `spark.read.parquet(path)` call re-resolves the source: a fresh
  * DataSource, a glob walk, and parquet footer schema inference — ~100–150 ms
  * of driver-side work per call measured by [[graft.FloorProbe]] (steady
  * state, q_wc: build 133 ms vs 137 ms for the whole execution). The bench
  * and verify harnesses build every query's frame from scratch per rep, so
  * across 319 queries × 2 reps this metadata tax alone was ~30–40 s of suite
  * wall — the single largest component of the per-query floor.
  *
  * This memo caches the INFERRED SCHEMA (a StructType — pure metadata) per
  * path and replays it via `spark.read.schema(st).parquet(path)`, which is
  * semantically identical to inference (the cached value IS the schema the
  * first call inferred) but skips the footer job. It is exactly what a real
  * deployment gets from its catalog (Hive metastore / Iceberg manifest):
  * known table schemas, data still scanned from files on every query. No
  * DATA or query RESULT is ever cached here — Bench/Verify compute every row
  * from parquet on every invocation.
  *
  * Scope: the immutable driver test tables (the sfDir parquet files). Paths a
  * query WRITES during its run (FileStorage topics, Files sinks) must not go
  * through this memo — their schema can legitimately change between calls.
  */
object TableCache {
  private val schemas = new ConcurrentHashMap[String, StructType]()
  // resolved-relation memo, keyed per session so a cached frame never
  // crosses SparkSessions; the WeakHashMap drops entries when a test
  // session is collected instead of pinning it for the JVM's lifetime
  private val relations =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, DataFrame]]()

  /** `spark.read.parquet(path)` with the resolved relation memoized per
    * (session, path) and the schema per path. Returning the same immutable
    * DataFrame object is the plain df-reuse idiom (self-joins of a shared
    * frame go through DeduplicateRelations like any `df.join(df)`), and it
    * skips the ~50 ms of per-call DataSource re-resolution that remained
    * after the schema memo. Never used for paths a query writes. */
  def parquet(spark: SparkSession, path: String): DataFrame = {
    val perSession = relations.synchronized {
      var m = relations.get(spark)
      if (m == null) { m = new ConcurrentHashMap[String, DataFrame](); relations.put(spark, m) }
      m
    }
    val hit = perSession.get(path)
    if (hit != null) hit
    else {
      val cached = schemas.get(path)
      val df =
        if (cached != null) spark.read.schema(cached).parquet(path)
        else {
          val d = spark.read.parquet(path)
          schemas.put(path, d.schema)
          d
        }
      perSession.put(path, df)
      df
    }
  }
}
