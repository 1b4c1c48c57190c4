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
  * slim (long, long) rows; the rank lineage is truncated by an eager
  * localCheckpoint every `checkpointEvery` (default 4) iterations — the
  * [[graft.llm.Dedup]] contraction loop's posture — so plan depth is
  * bounded regardless of `iters`. Long-safe while d·(max rank) < 2⁶³ —
  * max rank ≤ 10⁶·|V| ⇒ fine to ~10¹² nodes. */
object Graphs {

  /** Rank every node of `edges` (self-loops dropped, parallel edges
    * deduplicated). Output: (id, rank_micro) — one row per node appearing
    * as src or dst. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, dampMicro: Long = 850000L,
      checkpointEvery: Int = 4): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    require(dampMicro >= 0 && dampMicro <= 1000000L, "dampMicro in [0, 1e6]")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // out-degree rides ON the edge row (one join, paid once) so each
    // iteration is rank-join + groupBy(dst). The loop keeps the rank frame
    // SPARSE — only nodes with in-links appear; a node absent from it has
    // the algebraically-known teleport rank (10⁶ − d), supplied by
    // coalesce at the share join. That removes the full-node-set re-attach
    // shuffle the loop used to pay every round (r9: 3 → 2 keyed shuffles
    // per iteration, measured ~25% off the deep-iteration queries); the
    // dense frame is rebuilt ONCE after the loop. Arithmetic is unchanged
    // value-for-value, so the integer replay oracles are untouched.
    val eDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("__d")), Seq("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val baseRank = lit(1000000L - dampMicro)
    // sparse ranks: null until the first iteration (where every node holds
    // the uniform initial rank 10⁶ — a constant, so iteration 1 needs no
    // rank join at all)
    var ranks: DataFrame = null
    // the live loop checkpoint: freed the moment a newer eager checkpoint
    // supersedes it, so in-flight state is ≤1 checkpoint + 3 persisted
    // frames regardless of `iters` (r9 left all ⌈iters/4⌉ checkpoints AND
    // e/nodes/eDeg pinned until the harness or ContextCleaner got to them —
    // the residue behind q_pagerank_deep reading 7.9 s mid-suite vs 4.9 s
    // isolated)
    var liveCp: DataFrame = null
    var it = 0
    while (it < iters) {
      val shares =
        if (ranks == null)
          eDeg.select(col("dst").as("id"),
            expr(s"($dampMicro * (1000000 div __d)) div 1000000").as("__c"))
        else
          eDeg.join(ranks.select(col("id").as("src"), col("rank_micro")), Seq("src"), "left")
            .select(col("dst").as("id"),
              expr(s"($dampMicro * (coalesce(rank_micro, ${1000000L - dampMicro}) div __d)) div 1000000")
                .as("__c"))
      ranks = shares.groupBy("id").agg(sum("__c").as("__in"))
        .select(col("id"), (baseRank + col("__in")).as("rank_micro"))
      it += 1
      // lineage guard, enforced not advisory: without it the rank plan
      // deepens by two joins per round and deep-iteration runs (iters 10+)
      // hit multi-hundred-node plans and quadratic re-analysis. Same
      // posture as [[hits]] and the Dedup contraction loop; eager so the
      // round's work is done exactly once. Swap for `checkpoint` on a
      // real cluster where executor loss must not force a full recompute.
      if (it % checkpointEvery == 0 && it < iters) {
        ranks = ranks.localCheckpoint(true)
        // the eager checkpoint above has the rows in hand; the previous
        // one is now unreachable dead weight
        if (liveCp != null) org.apache.spark.sql.GraftBridge.freeLocalCheckpoint(liveCp)
        liveCp = ranks
      }
    }
    val result =
      if (ranks == null) nodes.withColumn("rank_micro", lit(1000000L))
      else nodes.join(ranks, Seq("id"), "left")
        .select(col("id"), coalesce(col("rank_micro"), baseRank).as("rank_micro"))
    // operator-exit cleanup: materialize the (slim, one-row-per-node)
    // answer eagerly, then release every scratch structure NOW instead of
    // leaving them for the ContextCleaner — an iterative operator already
    // runs jobs at call time (the eager loop checkpoints), so eager exit
    // changes no caller-visible semantics, and the returned frame is
    // self-contained
    val out = result.localCheckpoint(true)
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    eDeg.unpersist(blocking = false)
    if (liveCp != null) org.apache.spark.sql.GraftBridge.freeLocalCheckpoint(liveCp)
    out
  }

  /** HITS hub/authority scoring (Kleinberg 1999) in the same integer
    * micro-unit posture as [[pageRank]]: authority(v) = Σ_{u→v} hub(u),
    * hub(v) = Σ_{v→w} auth(w), each re-normalized after its update so the
    * MAXIMUM score is 10⁶ (max-normalization by integer floor division
    * replaces the usual L2 norm — scores only order nodes, and integer
    * div is the operation every engine replays bit-exact; the classical
    * L2 norm would reintroduce a sqrt and double accumulation). Missing
    * contributions are 0 — a node nobody links to has authority 0, a node
    * with no out-links has hub 0, exactly the fixed point HITS gives them.
    *
    * Scale shape per iteration: two keyed shuffles over slim (long, long)
    * rows (group contributions by dst for authority, by src for hub) and
    * two 1-row max aggregates that broadcast back via a literal-free
    * cross-join of a single-row frame — the [[graft.streams.Linear]]
    * global-aggregate pattern, no collect of node state. Long-safe while
    * 10⁶ · max-degree · 10⁶ < 2⁶³ (max in-/out-degree below ~9·10⁶;
    * beyond that, drop the pre-normalization scores to 10³ units). Output:
    * (id, hub_micro, auth_micro), one row per node. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // re-scale so max = 1e6: the 1-row max frame joins back by cross-join —
    // Catalyst broadcasts the single row, no driver round-trip. The raw
    // frame must be reuse-protected FIRST: the cross-join reads it twice
    // (once under max, once as probe), and each half-iteration feeds the
    // next — naive lazy composition doubles the plan per normalization and
    // recompute grows 4× per iteration (24.6 s naive vs 4.7–7 s cold
    // min-of-2 at sf0.1 across bench runs; the residual cost is the fixed
    // per-iteration job overhead — 2 keyed shuffles + 2 broadcast max
    // aggregates + the eager checkpoint — which ScaleProbe's hits_3it row
    // shows FLAT from 1× to 10× data, so it amortizes at scale).
    // Within an iteration the raw frames are persist()-shared;
    // the iteration-final hub is ONE eager localCheckpoint — a single job
    // per iteration that computes both normalizations and truncates the
    // round's lineage, after which the temporaries unpersist. Swap for
    // `checkpoint` on a real cluster where executor loss must not force a
    // full recompute.
    def maxNorm(raw: DataFrame, c: String): DataFrame = {
      val mx = raw.agg(max(col(c)).as("__mx"))
      raw.crossJoin(broadcast(mx))
        .select(col("id"),
          when(col("__mx") > 0, expr(s"(1000000 * $c) div __mx"))
            .otherwise(lit(0L)).as(c))
    }
    // The loop keeps hub/auth SPARSE: a node absent from the frame has
    // score 0 (nobody links to it / it links to nothing), and 0 scores
    // contribute 0 to every sum — so the contribution joins can be INNER
    // over the sparse frames and the full-node-set re-attach shuffle the
    // loop used to pay per half-iteration is gone (r9: 4 → 2 keyed
    // shuffles per iteration). Zeros rejoin once, after the loop. The
    // iteration-1 hub is the uniform constant 10⁶, so the first authority
    // pass needs no join at all: Σ hub over in-edges = 10⁶ · in-degree.
    var hub: DataFrame = null
    var auth: DataFrame = null
    // ≤1 live hub checkpoint at any time (same supersede-free posture as
    // [[pageRank]]): each iteration's eager hub checkpoint frees the
    // previous one on the spot
    var liveCp: DataFrame = null
    var it = 0
    while (it < iters) {
      val aIn =
        if (hub == null)
          e.groupBy("dst").agg((count(lit(1)) * 1000000L).as("auth_micro"))
            .select(col("dst").as("id"), col("auth_micro"))
        else
          e.join(hub.select(col("id").as("src"), col("hub_micro")), Seq("src"))
            .groupBy("dst").agg(sum("hub_micro").as("auth_micro"))
            .select(col("dst").as("id"), col("auth_micro"))
      val araw = aIn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      auth = maxNorm(araw, "auth_micro")
      val hraw = e.join(auth.select(col("id").as("dst"), col("auth_micro")), Seq("dst"))
        .groupBy("src").agg(sum("auth_micro").as("hub_micro"))
        .select(col("src").as("id"), col("hub_micro"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      hub = maxNorm(hraw, "hub_micro").localCheckpoint(true)
      // hub is materialized past them — the round's scratch state can go:
      // the raw persisted frames unpersist, and the PREVIOUS iteration's
      // hub checkpoint (consumed building this round's araw) is freed
      hraw.unpersist(blocking = false)
      if (liveCp != null) org.apache.spark.sql.GraftBridge.freeLocalCheckpoint(liveCp)
      liveCp = hub
      // the final auth must outlive araw's unpersist below — checkpoint it
      // eagerly on the last iteration (earlier iterations' auth is consumed
      // within the round and needs no pin)
      if (it == iters - 1) auth = auth.localCheckpoint(true)
      araw.unpersist(blocking = false)
      it += 1
    }
    // zeros rejoin here: a node missing from auth has authority 0, from
    // hub has hub 0 — exactly the fixed point HITS gives them
    val result = nodes
      .join(hub, Seq("id"), "left")
      .join(auth, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("hub_micro"), lit(0L)).as("hub_micro"),
        coalesce(col("auth_micro"), lit(0L)).as("auth_micro"))
    // operator-exit cleanup, same rationale as [[pageRank]]: pin the slim
    // answer, free the edge/node frames and the last hub/auth checkpoints
    val out = result.localCheckpoint(true)
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    org.apache.spark.sql.GraftBridge.freeLocalCheckpoint(hub)
    org.apache.spark.sql.GraftBridge.freeLocalCheckpoint(auth)
    out
  }
}
