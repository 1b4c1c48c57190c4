package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Envelope
import graft.ops.Temporal

/** Correctness wiring for the temporal joins. The as-of oracle is DuckDB's
  * native ASOF JOIN — two independent implementations of the operator
  * compared row-for-row. */
object TemporalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // each purchase matched to the user's latest click at or before it;
    // right side reduced to ONE row per (user_id, ts) — DuckDB's ASOF JOIN
    // picks an arbitrary row on right-timestamp ties, so both engines must
    // see a tie-free right side for the hash compare to be deterministic
    "q_asof_join" -> ((s, dir) => {
      val ev = Envelope.readEvents(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts")
        .agg(max("event_id").as("event_id"))
        .select("event_id", "user_id", "ts")
      Temporal.asofJoin(purchases, clicks, Seq("user_id"), "ts", "click_")
        .select(col("event_id"), col("user_id"), col("click_event_id").as("click_id"))
        .orderBy("event_id")
    }),

    // same-user event pairs within 10 minutes of each other
    "q_range_join" -> ((s, dir) => {
      val ev = Envelope.readEvents(s, dir)
        .select(col("event_id"), col("user_id"), Envelope.tsMs(col("ts")).as("tms"))
      Temporal.rangeJoin(ev, ev, Seq("user_id"), "tms", 600000L)
        .filter(col("event_id") < col("r_event_id"))
        .select(col("event_id").as("id_a"), col("r_event_id").as("id_b"))
        .orderBy("id_a", "id_b")
    }))

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """SELECT p.event_id, p.user_id, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS event_id
        |                FROM events WHERE event_type = 'click'
        |                GROUP BY user_id, ts) c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "q_range_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS tms FROM events)
        |SELECT a.event_id AS id_a, b.event_id AS id_b
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(a.tms - b.tms) <= 600000
        |ORDER BY id_a, id_b""".stripMargin)
}
