package graft.serde

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunking of oversized message values (kafi/chunker.py:25-63) and
  * reassembly (kafi/dechunker.py:15-75), as plain DataFrame ops:
  *
  *  - chunk: `posexplode(transform(sequence(...)))` — 1→N fanout inside
  *    codegen, chunk metadata as columns (the reference carries it in
  *    headers + key suffixes, helpers.py:356-376);
  *  - dechunk: groupBy(chunk_id) + array_sort(collect_list) + re-concat —
  *    one shuffle keyed by chunk id, map-side partial collection.
  *
  * Scale note: dechunk's only shuffle is by chunk_id; group size is bounded
  * by the original message size / chunk size, so no skew beyond the data's
  * own largest message.
  */
object Chunker {

  /** Split `value` into `chunkChars`-sized chunk messages. Every message
    * becomes ≥1 chunk; sub-threshold and null (tombstone) values are a
    * single chunk. Adds: chunk_id (stable per source message), chunk_seq,
    * chunk_total; `value` becomes the chunk payload. */
  def chunk(env: DataFrame, chunkChars: Int, idCols: Seq[String]): DataFrame = {
    val n = chunkChars
    val pieces = expr(
      s"""CASE WHEN value IS NULL OR length(value) <= $n THEN array(value)
         |ELSE transform(sequence(0, (length(value) - 1) div $n),
         |               i -> substring(value, i * $n + 1, $n)) END""".stripMargin)
    env
      .withColumn("chunk_id", concat_ws("-", idCols.map(col): _*))
      .withColumn("__pieces", pieces)
      .withColumn("chunk_total", size(col("__pieces")))
      .select(col("*"), posexplode(col("__pieces")).as(Seq("chunk_seq", "__piece")))
      .withColumn("value", col("__piece"))
      .drop("__pieces", "__piece")
  }

  /** Envelope-level chunking for a storage roundtrip (the reference's
    * produce-side scheme, kafi/helpers.py:356-376 + chunker.py:25-63):
    *
    *  - chunk key = original key + "_%06d" — DISTINCT per chunk, so log
    *    compaction keeps every chunk alive (a shared key would compact a
    *    message down to its last chunk);
    *  - `__partition_key` = the ORIGINAL key — the produce partitioner
    *    hashes it (LogProduce), so all chunks of a message land on one
    *    partition and dechunking needs no cross-partition repair;
    *  - chunk identity/sequence/total ride the envelope HEADERS (the
    *    envelope projection on produce would drop plain columns).
    *
    * Null keys stay null (no suffix); they hash to one partition here
    * (Spark's hash(null) is a constant), which is stronger than the
    * reference's round-robin spread for null keys. */
  private val hdrType = "array<struct<key:string,value:binary>>"

  def chunkEnvelope(env: DataFrame, chunkChars: Int, idCols: Seq[String]): DataFrame = {
    val chunkHdrs = array(
      struct(lit("chunk_id").as("key"), encode(col("chunk_id"), "UTF-8").as("value")),
      struct(lit("chunk_seq").as("key"), encode(col("chunk_seq").cast("string"), "UTF-8").as("value")),
      struct(lit("chunk_total").as("key"), encode(col("chunk_total").cast("string"), "UTF-8").as("value")))
    // the reference STARTS from the message's own headers and appends the
    // chunk entries (chunker.py:34-52) — user headers must survive a
    // chunked produce, not be replaced by the metadata
    val mergedHdrs =
      if (env.columns.contains("headers"))
        concat(coalesce(col("headers").cast(hdrType), array().cast(hdrType)), chunkHdrs)
      else chunkHdrs
    chunk(env, chunkChars, idCols)
      .withColumn("__partition_key", col("key"))
      .withColumn("headers", mergedHdrs)
      // format_string("%06d") widens past 6 digits like the reference's
      // f"_{n:06}" (helpers.py:374) — lpad would TRUNCATE seq ≥ 1e6 to its
      // first 6 digits and collide distinct chunk keys under compaction
      .withColumn("key",
        when(col("key").isNull, lit(null).cast("string"))
          .otherwise(concat(col("key"), format_string("_%06d", col("chunk_seq")))))
      .drop("chunk_id", "chunk_seq", "chunk_total")
  }

  /** Inverse of [[chunkEnvelope]] after a topic read: chunk metadata back
    * out of the headers, key suffix stripped at the LAST '_' (the suffix
    * widens past 6 digits for huge chunk counts, so a fixed 7-char strip
    * would mangle them; original keys may themselves contain '_', which the
    * last-'_' split leaves intact), then [[dechunk]]. The three chunk
    * metadata headers are removed on the way out, restoring the user's own
    * headers (dechunker.py:57-60 does the same deletes).
    *
    * Metadata is read from the LAST matching header: [[chunkEnvelope]]
    * APPENDS its entries after any preserved user headers, so a user
    * header that happens to be named chunk_seq must not shadow the real
    * sequence number (first-match would mis-order chunks, or kill the
    * query on a non-numeric ANSI cast). User headers with those reserved
    * names are indistinguishable from chunk metadata on the wire and do
    * not survive the round trip — same ambiguity in the reference. The
    * lookup goes through get(reverse(...), 0), which yields NULL (not an
    * ANSI error) for non-chunked rows with no matching header at all. */
  def dechunkEnvelope(env: DataFrame): DataFrame = {
    def h(name: String) =
      decode(expr(s"get(reverse(filter(headers, x -> x.key = '$name')), 0).value"), "UTF-8")
    dechunk(env
      .withColumn("chunk_id", h("chunk_id"))
      .withColumn("chunk_seq", h("chunk_seq").cast("int"))
      .withColumn("chunk_total", h("chunk_total").cast("int"))
      .withColumn("headers", expr(
        "filter(headers, x -> NOT (x.key IN ('chunk_id', 'chunk_seq', 'chunk_total')))"))
      .withColumn("key",
        when(col("key").isNull, lit(null).cast("string"))
          .otherwise(expr(
            "substring(key, 1, length(key) - length(substring_index(key, '_', -1)) - 1)"))))
  }

  /** Reassemble chunked messages: group by chunk_id, order chunks by
    * chunk_seq, concatenate payloads; all non-value columns are taken from
    * the first chunk. */
  def dechunk(chunked: DataFrame): DataFrame = {
    val carry = chunked.columns.filterNot(
      Set("value", "chunk_id", "chunk_seq", "chunk_total", "__piece"))
    val firsts = carry.map(c => expr(s"min_by($c, chunk_seq)").as(c))
    chunked
      .groupBy("chunk_id")
      .agg(
        expr("""array_join(transform(array_sort(collect_list(struct(chunk_seq, value))),
               |          x -> x.value), '')""".stripMargin).as("__joined"),
        (firsts :+ expr("min_by(value is null, chunk_seq)").as("__wasnull")): _*)
      .withColumn("value", when(col("__wasnull"), lit(null)).otherwise(col("__joined")))
      .drop("__joined", "__wasnull", "chunk_id")
  }
}
