package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph authority scoring — the Common-Crawl-style domain ranking a
  * web-corpus curation pipeline uses to weight sources (harmonic/PageRank
  * centrality over the host graph decides which domains' documents are
  * worth keeping; the reference corpus has no native graph op, this is
  * part of the beyond-reference training-data surface).
  *
  * PageRank in INTEGER micro-rank arithmetic — the engine's replay
  * posture applied to an iterative algorithm: every update is
  * `r'(v) = (10⁶ − d) + Σ_{u→v} (d · (r(u) div outdeg(u))) div 10⁶`
  * with d the damping in micro-units (0.85 → 850000). Integer division at
  * both steps makes every iteration bit-exact in any engine — no double
  * accumulation anywhere — at the cost of ≤1 micro-rank of floor loss per
  * edge (irrelevant to ranking). Conventions, documented: per-node
  * teleport (the (1−d) term is uniform per node, not divided by N) and
  * dangling-node mass simply leaks (the standard simplification when
  * ranks only order nodes).
  *
  * Scale shape: one shuffle per iteration (contributions grouped by dst,
  * map-side combined) plus the share join on src — both keyed joins over
  * slim (long, long) rows; iterations are a fixed small count, and the
  * plan depth grows linearly with `iters` (for iters ≳ 10 add a
  * localCheckpoint every few rounds, the [[graft.llm.Dedup]] contraction
  * loop's lineage posture). Long-safe while d·(max rank) < 2⁶³ —
  * max rank ≤ 10⁶·|V| ⇒ fine to ~10¹² nodes. */
object Graphs {

  /** Rank every node of `edges` (self-loops dropped, parallel edges
    * deduplicated). Output: (id, rank_micro) — one row per node appearing
    * as src or dst. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, dampMicro: Long = 850000L): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    require(dampMicro >= 0 && dampMicro <= 1000000L, "dampMicro in [0, 1e6]")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("__d"))
      .select(col("src").as("id"), col("__d"))
    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    var it = 0
    while (it < iters) {
      val shares = ranks.join(outdeg, Seq("id"))
        .select(col("id").as("src"),
          expr(s"($dampMicro * (rank_micro div __d)) div 1000000").as("__c"))
      val contribs = e.join(shares, Seq("src"))
        .groupBy("dst").agg(sum("__c").as("__in"))
        .select(col("dst").as("id"), col("__in"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(1000000L - dampMicro) + coalesce(col("__in"), lit(0L))).as("rank_micro"))
      it += 1
    }
    ranks
  }
}
