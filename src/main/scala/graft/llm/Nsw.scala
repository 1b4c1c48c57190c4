package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph ANN — the sixth family next to brute / LSH / IVF / PQ / IVF-PQ:
  * a navigable-small-world graph (Malkov & Yashunin's HNSW, flattened to
  * one layer) built PER PARTITION, searched map-side, merged through the
  * shared bounded top-k aggregator.
  *
  * Why per-partition graphs are the Spark-native shape: a global HNSW is
  * a pointer-chasing structure with random access across the whole
  * corpus — the exact thing a shared-nothing cluster cannot give you.
  * The scalable decomposition is the one every distributed graph-ANN
  * deployment uses: shard the corpus, build an independent graph per
  * shard (embarrassingly parallel, memory ∝ one shard), fan the query
  * set across shards map-side, and merge the per-shard top-k lists —
  * |shards| × |queries| × k slim rows, never a corpus-sized shuffle.
  * Search cost per shard is sub-linear in shard size, which is where
  * the win over the brute scan comes from at scale.
  *
  * Why ONE layer instead of the hierarchy: the hierarchy's log-factor
  * speedup pays off when a single graph holds the whole corpus; a Spark
  * partition holds at most a few hundred thousand rows, where greedy
  * beam entry from a fixed node costs the same handful of hops. Layers
  * would add level bookkeeping with no measurable gain at partition
  * granularity (the same reasoning that sizes IVF's nlist to the shard,
  * not the corpus).
  *
  * Determinism and the connectivity guarantee: nodes insert in
  * ascending-id order; each node links bidirectionally to the `m` best
  * results of a beam search over the graph built so far, and neighbor
  * lists prune to `2 m` keeping the most similar. Pruning in HNSW can
  * in principle disconnect a region from the entry point — a silent
  * recall hole. Here every node additionally keeps an IMPLICIT backbone
  * edge to its insertion predecessor and successor (ids i−1, i+1; never
  * stored, never prunable), so the searched graph is connected BY
  * CONSTRUCTION: recall degrades gracefully as `ef` shrinks but the
  * reachable set is always the whole partition. That guarantee is what
  * makes the exhaustive setting (`ef` ≥ partition size) provably equal
  * to brute force — the correctness contract q_ann_nsw pins against the
  * DuckDB brute oracle.
  *
  * The pair cosine reproduces [[graft.functions.CosineSimilarity]]'s
  * arithmetic bit-for-bit (min-length loop, joint accumulation,
  * zero-norm → 0.0) and ranking uses [[Ann.TopKAgg]]'s exact order
  * (sim desc, id asc, NaN-first, −0.0 ≡ 0.0), so the graph path and the
  * brute path agree to the last ulp wherever both return a pair. */
object Nsw {

  /** [[graft.functions.CosineSimilarity.nullSafeEval]]'s arithmetic. */
  private[llm] def pairCosine(x: Array[Float], y: Array[Float]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  private def normZ(d: Double): Double = if (d == 0.0) 0.0 else d

  /** TopKAgg's total order: true iff (sa, ia) ranks strictly better. */
  private def better(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(normZ(sa), normZ(sb))
    c > 0 || (c == 0 && ia < ib)
  }

  /** Beam search from node 0 over nodes [0, limit): returns the up-to-ef
    * best (sim, node) by `better`, best first. Neighbors of u are its
    * stored adjacency plus the implicit backbone pair u±1. With
    * ef ≥ limit the walk visits the entire (connected) graph — exact. */
  private def beam(q: Array[Float], vecs: Array[Array[Float]], ids: Array[Long],
      adj: Array[scala.collection.mutable.ArrayBuffer[Int]], limit: Int,
      ef: Int): Array[(Double, Int)] = {
    // ordering helpers over (sim, node): node identity for ties uses the
    // ROW id (ids(node)), matching the rank order downstream
    def beats(a: (Double, Int), b: (Double, Int)): Boolean =
      better(a._1, ids(a._2), b._1, ids(b._2))
    val visited = new java.util.BitSet(limit)
    // W: current best ≤ ef, worst on top; C: frontier, best on top
    val w = new java.util.PriorityQueue[(Double, Int)](ef.min(limit).max(1),
      (a: (Double, Int), b: (Double, Int)) =>
        if (beats(a, b)) 1 else if (beats(b, a)) -1 else 0)
    val c = new java.util.PriorityQueue[(Double, Int)](16,
      (a: (Double, Int), b: (Double, Int)) =>
        if (beats(a, b)) -1 else if (beats(b, a)) 1 else 0)
    val e0 = (pairCosine(q, vecs(0)), 0)
    visited.set(0); w.add(e0); c.add(e0)
    while (!c.isEmpty) {
      val cur = c.poll()
      // the best frontier entry cannot improve a FULL result set → done
      if (w.size >= ef && beats(w.peek(), cur)) { c.clear() }
      else {
        val u = cur._2
        def visit(v: Int): Unit = if (v >= 0 && v < limit && !visited.get(v)) {
          visited.set(v)
          val sv = (pairCosine(q, vecs(v)), v)
          if (w.size < ef || beats(sv, w.peek())) {
            w.add(sv); c.add(sv)
            if (w.size > ef) w.poll()
          }
        }
        visit(u - 1); visit(u + 1)
        val nbs = adj(u)
        var i = 0
        while (i < nbs.length) { visit(nbs(i)); i += 1 }
      }
    }
    val out = new Array[(Double, Int)](w.size)
    var i = out.length - 1
    while (i >= 0) { out(i) = w.poll(); i -= 1 }
    out
  }

  /** Build the per-partition graph: ascending-id insertion, `m` links to
    * the beam's best, bidirectional, lists pruned to 2 m most-similar
    * (the backbone pair lives outside the lists and never prunes). */
  private def buildGraph(vecs: Array[Array[Float]], ids: Array[Long],
      m: Int, efConstruction: Int): Array[scala.collection.mutable.ArrayBuffer[Int]] = {
    val n = vecs.length
    val mmax = 2 * m
    val adj = Array.fill(n)(new scala.collection.mutable.ArrayBuffer[Int](mmax + m))
    def prune(u: Int): Unit = if (adj(u).length > mmax) {
      val kept = adj(u).toArray
        .map(v => (pairCosine(vecs(u), vecs(v)), v))
        .sortWith((a, b) => better(a._1, ids(a._2), b._1, ids(b._2)))
        .take(mmax).map(_._2)
      adj(u).clear(); adj(u) ++= kept
    }
    var i = 1
    while (i < n) {
      val found = beam(vecs(i), vecs, ids, adj, i, math.max(efConstruction, m))
      var j = 0
      while (j < found.length && j < m) {
        val v = found(j)._2
        adj(i) += v; adj(v) += i
        prune(v)
        j += 1
      }
      i += 1
    }
    adj
  }

  /** Build the per-shard graphs as a DATAFRAME — one row per shard
    * (ids, vectors, adjacency) — so the index is a first-class dataset:
    * persist it, write it to parquet, reload it next session, and run
    * [[searchIndex]] against it without paying construction again. This
    * is the shape a 100 TB deployment actually uses: the index builds
    * once per corpus snapshot (embarrassingly parallel, one pass), and
    * query batches amortize it. Row size is the shard's vectors +
    * adjacency (the same bytes an external ANN index file would hold,
    * sharded); the backbone chain is positional (i±1), so it survives
    * serialization for free. */
  def index(corpus: DataFrame, idCol: String, embCol: String, m: Int = 8,
      efConstruction: Int = 64): DataFrame = {
    require(m >= 1, "nsw: m must be positive")
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col(idCol).cast("long"), col(embCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val rows = it.filter(r => r._2 != null && r._2.nonEmpty).toArray.sortBy(_._1)
        if (rows.isEmpty) Iterator.empty
        else {
          val ids = rows.map(_._1)
          val vecs = rows.map(_._2)
          val adj = buildGraph(vecs, ids, m, efConstruction)
          Iterator.single((ids, vecs, adj.map(_.toArray)))
        }
      }
      .toDF("ids", "vecs", "adj")
  }

  /** Search a prebuilt [[index]]: one flatMap over the shard rows, the
    * same beam kernel, the same bounded merge — on the same corpus
    * partitioning and parameters this returns EXACTLY [[searchTopK]]'s
    * rows (NswSpec pins it, including through a parquet roundtrip). */
  def searchIndex(idx: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int, ef: Int = 64): DataFrame = {
    require(k >= 1 && ef >= 1, "nsw: k, ef must be positive")
    val spark = idx.sparkSession
    import spark.implicits._
    val qRows = queries.select(col(idCol).cast("long"), col(embCol).cast("array<float>"))
      .as[(Long, Array[Float])].collect()
      .filter(r => r._2 != null && r._2.nonEmpty).sortBy(_._1)
    val qb = spark.sparkContext.broadcast(qRows)
    val effEf = math.max(ef, k)
    val perShard = idx.select(col("ids"), col("vecs"), col("adj"))
      .as[(Array[Long], Array[Array[Float]], Array[Array[Int]])]
      .flatMap { case (ids, vecs, adjArr) =>
        if (ids.isEmpty || qb.value.isEmpty) Iterator.empty
        else {
          val adj = adjArr.map(a => scala.collection.mutable.ArrayBuffer.from(a))
          qb.value.iterator.flatMap { case (qid, qv) =>
            beam(qv, vecs, ids, adj, ids.length, effEf)
              .iterator.filter { case (_, node) => ids(node) != qid }
              .take(k)
              .map { case (sim, node) => (qid, ids(node), sim) }
          }
        }
      }
      .toDF("q_id", "nn_id", "cosine")
    Ann.topKPerQuery(perShard, k)
  }

  /** Per-shard NSW search, global bounded-top-k merge. `queries` is
    * collected and broadcast — bounded by retrieval's premise exactly
    * like [[Ann.bruteForceTopK]]'s broadcast side. `ef` ≥ every shard's
    * row count makes the result provably identical to brute force (the
    * oracle setting); production sets ef a small multiple of k.
    * Fuses build + search in one pass; for repeated query batches over
    * one corpus snapshot, build [[index]] once and [[searchIndex]] it.
    * Output: (q_id, nn_id, rank, cosine), rank ≤ k by (cosine desc, id). */
  def searchTopK(corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      k: Int, m: Int = 8, efConstruction: Int = 64, ef: Int = 64): DataFrame = {
    require(m >= 1 && k >= 1 && ef >= 1, "nsw: m, k, ef must be positive")
    val spark = corpus.sparkSession
    import spark.implicits._
    val qRows = queries.select(col(idCol).cast("long"), col(embCol).cast("array<float>"))
      .as[(Long, Array[Float])].collect()
      .filter(r => r._2 != null && r._2.nonEmpty).sortBy(_._1)
    val qb = spark.sparkContext.broadcast(qRows)
    val effEf = math.max(ef, k)
    val perShard = corpus.select(col(idCol).cast("long"), col(embCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val rows = it.filter(r => r._2 != null && r._2.nonEmpty).toArray.sortBy(_._1)
        if (rows.isEmpty || qb.value.isEmpty) Iterator.empty
        else {
          val ids = rows.map(_._1)
          val vecs = rows.map(_._2)
          val adj = buildGraph(vecs, ids, m, efConstruction)
          qb.value.iterator.flatMap { case (qid, qv) =>
            beam(qv, vecs, ids, adj, rows.length, effEf)
              .iterator.filter { case (_, node) => ids(node) != qid }
              .take(k)
              .map { case (sim, node) => (qid, ids(node), sim) }
          }
        }
      }
      .toDF("q_id", "nn_id", "cosine")
    Ann.topKPerQuery(perShard, k)
  }
}
