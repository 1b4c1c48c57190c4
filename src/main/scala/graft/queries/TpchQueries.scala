package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Headline analytical queries (TPC-H-shaped) — the bench's scale signal.
  * Plans are the ones a 1000-executor cluster wants: dimension sides
  * broadcast, date filters pushed to the lineitem scan, one shuffle per
  * aggregation, decimal arithmetic for cross-engine exactness.
  */
object TpchQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    s.read.parquet(s"$dir/$n.parquet")

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1-style pricing summary: one scan, one agg shuffle, filter pushed
    "q1_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec("l_quantity")).cast("double").as("sum_qty"),
          sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Q3-style shipping priority: broadcast customer dim, top-10 revenue
    "q3_topk" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(broadcast(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), unix_millis(col("o_orderdate").cast("timestamp")).as("orderdate_ms"), col("revenue"))
    }),

    // Q4-style: EXISTS as a LEFT SEMI join — orders with any lineitem
    // shipped > 30 days after the order date, counted per priority. The
    // semi-join shuffles both sides on the order key ONCE and never
    // materializes the match multiplicity (a plain join + distinct would
    // blow up |matches| first); the extra lateness predicate rides the
    // join, not a post-filter.
    "q4_priority" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      ord.join(li,
          ord("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_late"))
        .orderBy("o_orderpriority")
    }),

    // NOT EXISTS as a LEFT ANTI join — parts with no shipment since
    // 2001-06-01, per brand. The date filter prunes the probe side AT THE
    // SCAN (PushedFilters), so the anti-join's build input is the slim
    // recent slice, not all of lineitem.
    "q16_quiet_parts" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val recent = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2001-06-01"))
        .select("l_partkey")
      p.join(recent, col("p_partkey") === col("l_partkey"), "left_anti")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_quiet"))
        .orderBy("p_brand")
    }),

    // Q10-style returned-item revenue: the one deliberately NON-broadcast
    // big join — lineitem('R') ⋈ orders shuffles on the order key (at
    // scale neither side broadcasts); customer⋈nation stays a broadcast
    // dim chain on top. Top-20 by revenue.
    "q10_returns" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val ord = t(s, dir, "orders")
      val dims = broadcast(t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(dims, col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q18-style large orders: aggregate-then-join. The HAVING aggregate
    // hash-partitions lineitem on l_orderkey, and the subsequent join to
    // orders reuses that partitioning (no second lineitem shuffle).
    "q18_large_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(dec("l_quantity")).as("__qty"))
        .filter(col("__qty") > lit(200).cast("decimal(18,2)"))
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("orderdate_ms"),
          col("__qty").cast("double").as("sum_qty"))
        .orderBy("o_orderkey")
    }),

    // Q5-style local supplier volume: the full dim chain broadcast
    "q5_region" -> ((s, dir) => {
      val dims = broadcast(
        t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey")))
      t(s, dir, "lineitem")
        .join(dims, col("l_suppkey") === col("s_suppkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("double").as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }))

  val oracles: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_topk" ->
      """SELECT l_orderkey, epoch_ms(o_orderdate) AS orderdate_ms,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q4_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late
        |FROM orders o WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q16_quiet_parts" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_quiet
        |FROM part p WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_partkey = p.p_partkey
        |    AND l.l_shipdate >= TIMESTAMP '2001-06-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_returns" ->
      """SELECT c_custkey, c_name, n_name,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q18_large_orders" ->
      """SELECT o_orderkey, epoch_ms(o_orderdate) AS orderdate_ms,
        |CAST(sum_qty AS DOUBLE) AS sum_qty
        |FROM orders JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200) ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "q5_region" ->
      """SELECT r_name, n_name,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
