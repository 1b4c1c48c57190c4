package graft.streams

import org.apache.spark.sql.{Column, DataFrame}

/** A small dataflow DSL mirroring the reference's TopologyNode DAG
  * (kafi/streams/topologynode.py:37-57, build/reset :1035-1057,
  * topology/mermaid :1252-1315) — but *compiling to* a single Catalyst plan
  * instead of wiring a circuit: `build()` is a memoized bottom-up DFS that
  * produces one DataFrame; Catalyst then optimizes across node boundaries
  * (filter pushdown through maps, join reordering), which the reference's
  * executed-as-written circuit cannot do (SURVEY §4.1).
  */
final class TNode private (
    val name: String,
    val parents: Seq[TNode],
    build: Seq[DataFrame] => DataFrame) {

  private var cache: Option[DataFrame] = None

  /** Bottom-up memoized DFS — the analogue of build/reset
    * (topologynode.py:1035-1057). */
  def df: DataFrame = cache.getOrElse {
    val out = build(parents.map(_.df))
    cache = Some(out)
    out
  }

  private def visitedSet(): java.util.Set[TNode] =
    java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[TNode, java.lang.Boolean]())

  /** reset — drop memoized plans in this subtree (topologynode.py:1053-1057).
    * Visited-set walk: shared nodes (diamonds) are reset once, not 2^depth
    * times. */
  def reset(): Unit = {
    val seen = visitedSet()
    def walk(n: TNode): Unit = if (seen.add(n)) { n.cache = None; n.parents.foreach(walk) }
    walk(this)
  }

  private def node(n: String, f: DataFrame => DataFrame): TNode =
    new TNode(n, Seq(this), dfs => f(dfs.head))

  def map(cols: Column*): TNode = node("map", ZSet.map(_)(cols: _*))
  def filter(pred: Column): TNode = node("filter", ZSet.filter(_)(pred))
  def flatmap(generator: Column, keep: Column*): TNode =
    node("flatmap", ZSet.flatmap(_)(generator, keep: _*))
  def distinct: TNode = node("distinct", ZSet.distinct)
  def neg: TNode = node("neg", ZSet.neg)
  /** peek — identity + side-effect on the materialized plan
    * (topologynode.py:157-183); observation, not a plan change. */
  def peek(f: DataFrame => Unit): TNode = node("peek", d => { f(d); d })

  def union(o: TNode): TNode = new TNode("union", Seq(this, o), d => ZSet.union(d(0), d(1)))
  def merge(o: TNode): TNode = new TNode("merge", Seq(this, o), d => ZSet.merge(d(0), d(1)))
  def minus(o: TNode): TNode = new TNode("minus", Seq(this, o), d => ZSet.minus(d(0), d(1)))
  def intersect(o: TNode): TNode = new TNode("intersect", Seq(this, o), d => ZSet.intersect(d(0), d(1)))
  def join(o: TNode, cond: Column): TNode = new TNode("join", Seq(this, o), d => ZSet.join(d(0), d(1), cond))

  // group outputs are themselves Z-sets: each (key, agg) record re-enters
  // the algebra with weight +1 (the reference's group_by_agg projection,
  // topologynode.py:477-487)
  def groupBySum(keys: Seq[String], value: Column, as: String): TNode =
    node("group_by_sum", d => ZSet.fromRecords(ZSet.groupBySum(d, keys, value, as)))
  def groupByCount(keys: Seq[String], as: String = "count"): TNode =
    node("group_by_count", d => ZSet.fromRecords(ZSet.groupByCount(d, keys, as)))
  def groupByMax(keys: Seq[String], value: Column, as: String): TNode =
    node("group_by_max", d => ZSet.fromRecords(ZSet.groupByMax(d, keys, value, as)))
  def groupByMin(keys: Seq[String], value: Column, as: String): TNode =
    node("group_by_min", d => ZSet.fromRecords(ZSet.groupByMin(d, keys, value, as)))
  def agg(aggs: Column*): TNode =
    node("agg", d => ZSet.fromRecords(ZSet.globalAgg(d)(aggs: _*)))

  /** sink — tag this node as a named output (topologynode.py:991-994);
    * multi-sink demux happens in graft.streaming.Runner. */
  def sink(sinkName: String): TNode = node(s"sink:$sinkName", identity)

  /** topology — indented DAG pretty-print (topologynode.py:1252-1269);
    * shared subtrees print once, later references as `name (shared)`. */
  def topology: String = {
    val sb = new StringBuilder
    val seen = visitedSet()
    def walk(n: TNode, depth: Int): Unit = {
      if (seen.add(n)) {
        sb.append("  " * depth).append(n.name).append('\n')
        n.parents.foreach(walk(_, depth + 1))
      } else sb.append("  " * depth).append(n.name).append(" (shared)\n")
    }
    walk(this, 0)
    sb.result()
  }

  /** mermaid — graph TD rendering of the DAG (topologynode.py:1271-1315). */
  def mermaid: String = {
    val ids = scala.collection.mutable.LinkedHashMap[TNode, String]()
    def id(n: TNode): String = ids.getOrElseUpdate(n, s"n${ids.size}")
    val edges = scala.collection.mutable.LinkedHashSet[String]()
    val seen = visitedSet()
    def walk(n: TNode): Unit = if (seen.add(n)) {
      val me = id(n)
      n.parents.foreach { p => walk(p); edges += s"  ${id(p)}[${p.name}] --> $me[${n.name}]" }
    }
    walk(this)
    ("graph TD" +: edges.toSeq).mkString("\n")
  }
}

object TNode {
  /** source — named input node (topologynode.py:977-989). */
  def source(name: String, data: => DataFrame): TNode =
    new TNode(s"source:$name", Nil, _ => data)
}
