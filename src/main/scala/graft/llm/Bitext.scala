package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (round 15) — the parallel-corpus miner of
  * Artetxe & Schwenk 2019 ("Margin-based Parallel Corpus Mining with
  * Multilingual Sentence Embeddings", the CCMatrix/WikiMatrix method):
  * a candidate pair (x, y) across two embedding spaces is scored not by
  * raw cosine but by the RATIO margin
  *
  *   margin(x, y) = cos(x, y) / ((meanK(x) + meanK(y)) / 2)
  *
  * where meanK(x) is the mean cosine of x to its k nearest neighbors in
  * the OTHER corpus (and meanK(y) symmetrically). The normalization
  * cancels hubness: a sentence that is close to everything (a hub) has a
  * high meanK, so its raw-cosine matches stop outranking genuinely
  * aligned pairs. Mining parallel training data for MT is exactly this
  * at 100 TB: embed both monolingual corpora, kNN both directions,
  * margin-score, keep pairs above a threshold (CCMatrix used ~1.06).
  *
  * Scale shape: everything after candidate generation is slim — top-k
  * lists are |src|·k and |tgt|·k rows of (id, id, cosine), the mean
  * columns are per-id aggregates of those lists, and the final join is
  * keyed on ids. Candidate generation itself is pluggable exactly like
  * the ANN family: this entry point rides [[Ann.bruteForceTopK]] (the
  * oracle-able baseline); at corpus scale the same margin arithmetic
  * consumes [[Ann.lshTopK]] / [[Ivf.search]] lists instead — the
  * downstream columns are identical.
  *
  * Determinism note (the engine-wide replay contract): meanK is summed
  * in RANK order over the sorted top-k list — collect_list order is
  * never trusted (the [[Notebooks]] rule), and a rank-ordered fold is
  * the same float sequence in any engine.
  *
  * Reference scope: kafi has no embedding surface; this is part of the
  * LLM-pipeline extension, sibling to [[Ann]] and [[Dedup]].
  */
object Bitext {

  /** Mean of the rank-ordered cosine list — a deterministic left fold,
    * bit-identical to `list_sum(list(cosine ORDER BY rank)) / k`. */
  private def meanByRank(topk: DataFrame, outCol: String): DataFrame =
    topk.groupBy(col("q_id"))
      .agg(sort_array(collect_list(struct(col("rank"), col("cosine")))).as("__l"))
      .select(col("q_id"),
        (aggregate(col("__l"), lit(0.0), (acc, s) => acc + s.getField("cosine"))
          / size(col("__l")).cast("double")).as(outCol))

  /** Forward candidates with margin scores and the mutual-top-k flag.
    * `src`/`tgt` carry (idCol, embCol); ids must be disjoint across the
    * two sides (they identify rows in the output). Output: one row per
    * (x ∈ src, y ∈ its top-k in tgt) — `q_id`, `nn_id`, `rank`,
    * `cosine`, `margin`, `mutual` (1 when x is also in y's top-k over
    * src — the intersection criterion of the paper's §4). Callers
    * threshold on `margin` and/or require `mutual` = 1. */
  def marginPairs(src: DataFrame, tgt: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame =
    marginPairsFrom(
      Ann.bruteForceTopK(tgt, src, idCol, embCol, k),
      Ann.bruteForceTopK(src, tgt, idCol, embCol, k))

  /** The margin arithmetic over PRECOMPUTED top-k lists — the seam the
    * scale path plugs into: feed [[Ann.lshTopK]] / [[Ivf.search]]
    * lists (same (q_id, nn_id, rank, cosine) columns) and the
    * downstream margins are identical whenever the approximate lists
    * match the exact ones (BitextSpec holds that equality on a corpus
    * where LSH recall is total). */
  def marginPairsFrom(fwd: DataFrame, bwd: DataFrame): DataFrame = {
    val meanX = meanByRank(fwd, "mean_x")
    val meanY = meanByRank(bwd, "mean_y").withColumnRenamed("q_id", "nn_id")
    val mutual = bwd.select(col("q_id").as("nn_id"), col("nn_id").as("q_id"))
      .withColumn("mutual", lit(1))
    fwd
      .join(meanX, "q_id")
      .join(meanY, "nn_id")
      .join(mutual, Seq("q_id", "nn_id"), "left")
      .withColumn("mutual", coalesce(col("mutual"), lit(0)))
      .withColumn("margin",
        col("cosine") / ((col("mean_x") + col("mean_y")) / lit(2.0)))
      .select("q_id", "nn_id", "rank", "cosine", "margin", "mutual")
  }

  /** Convenience gate: mined pairs at `threshold`, mutual-best only —
    * the CCMatrix acceptance rule. */
  def mine(src: DataFrame, tgt: DataFrame, idCol: String, embCol: String,
      k: Int, threshold: Double): DataFrame =
    marginPairs(src, tgt, idCol, embCol, k)
      .filter(col("mutual") === 1 && col("margin") >= threshold)

  /** Type helper so callers can pass a Column threshold if they carry
    * it from config tables. */
  def mine(src: DataFrame, tgt: DataFrame, idCol: String, embCol: String,
      k: Int, threshold: Column): DataFrame =
    marginPairs(src, tgt, idCol, embCol, k)
      .filter(col("mutual") === 1 && col("margin") >= threshold)
}
