package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-layout operators: token-window chunking and sequence packing —
  * the step between a cleaned corpus and a pretraining dataloader.
  *
  * Both are deterministic integer arithmetic over token counts, so both
  * carry full DuckDB oracles (q_text_chunks, q_pack_sequences).
  */
object Packing {

  /** Split each document into token windows of `maxTokens` advancing by
    * `stride` (stride < maxTokens ⇒ overlapping windows, the usual
    * fine-tuning chunking; stride = maxTokens ⇒ disjoint). The window count
    * is ceil(max(n - maxTokens, 0) / stride) + 1 — every token lands in ≥1
    * window and a short document yields exactly its whole text.
    *
    * Typed flatMap kernel (per-row scalar loop, same rationale as
    * [[Dedup.minhashSignature]]): one split powers all windows; no shuffle —
    * a pure map stage that pipelines over the scan at any scale.
    * Output: (idCol, chunk_ix, n_tokens of the chunk, chunk text). */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int = 64, stride: Int = 48): DataFrame = {
    require(maxTokens > 0 && stride > 0, "maxTokens and stride must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        val n = toks.length
        val nChunks = (math.max(n - maxTokens, 0) + stride - 1) / stride + 1
        (0 until nChunks).iterator.map { ci =>
          val from = ci * stride
          val until = math.min(from + maxTokens, n)
          (id, ci.toLong, (until - from).toLong, toks.slice(from, until).mkString(" "))
        }
      }
      .toDF(idCol, "chunk_ix", "n_tokens", "chunk")
  }

  /** Concat-and-split sequence packing (the GPT-style pretraining layout):
    * within each shard, documents are laid out in ascending `idCol` order,
    * token runs concatenated, and the stream cut at `budget`-token
    * boundaries. Emits, per document, the context window its first token
    * lands in (`seq_id`, per-shard) and the offset inside it — the
    * assignment table a writer job uses to materialize packed sequences.
    *
    * Sharding IS the scale story: packing is a prefix-sum, inherently
    * sequential, so a single global order would funnel 100 TB through one
    * sorted partition. Per-shard windows (shuffle on `shardCol`, sort
    * within) keep it embarrassingly parallel across shards — each shard is
    * one training file, which is how production layouts shard anyway.
    * Skew guard: shard by a uniform function of the id (e.g. id % nShards),
    * never by a content-correlated key. */
  def packSequences(df: DataFrame, idCol: String, shardCol: String,
      nTokensCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
    df.withColumn("__cum", sum(col(nTokensCol)).over(w) - col(nTokensCol))
      .withColumn("seq_id", expr(s"__cum div $budget"))
      .withColumn("seq_offset", col("__cum") % budget)
      .drop("__cum")
  }
}
