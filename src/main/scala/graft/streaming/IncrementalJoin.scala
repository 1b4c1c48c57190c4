package graft.streaming

import java.nio.file.{Files => JFiles, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.streams.ZSet

/** Stream-stream THETA join — unsupported by Structured Streaming's native
  * stream-stream join (equi-keys + watermarks only), and SURVEY §7.4's
  * recommended shape: foreachBatch + accumulated state + the bilinear
  * delta rule (ZSet.joinDelta):
  *
  *   per micro-batch:  Δout = ΔA ⋈ B  +  A ⋈ ΔB  +  ΔA ⋈ ΔB
  *   then:             A += ΔA ;  B += ΔB
  *
  * State lives as parquet Z-set tables (consolidated each step — the
  * analogue of `evaluator.compact()` in the reference's `latest`,
  * topologynode.py:1110-1129). Each step's cost is O(|Δ| · matched), never
  * a recomputation of A ⋈ B; retractions flow through the weights
  * unchanged.
  *
  * Restart note: state tables persist across restarts; pairing this with a
  * checkpointed foreachBatch stream gives effectively-once delta emission
  * (state writes are idempotent per batch id if the caller keys outputs by
  * batch).
  */
class IncrementalJoin(
    spark: SparkSession,
    stateDir: String,
    schemaA: StructType,
    schemaB: StructType,
    cond: Column) {

  private def statePath(side: String) = s"$stateDir/$side"

  private def readState(side: String, schema: StructType): DataFrame = {
    val p = Paths.get(statePath(side))
    if (JFiles.exists(p)) spark.read.schema(schema).parquet(statePath(side))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private def writeState(side: String, df: DataFrame): Unit = {
    // write-new-then-swap: readers never see a half-written state
    val tmp = s"${statePath(side)}_next"
    df.write.mode("overwrite").parquet(tmp)
    val cur = Paths.get(statePath(side))
    if (JFiles.exists(cur)) {
      val old = Paths.get(s"${statePath(side)}_old")
      JFiles.move(cur, old)
      JFiles.move(Paths.get(tmp), cur)
      import scala.jdk.CollectionConverters._
      val s = JFiles.walk(old)
      try s.iterator().asScala.toSeq.reverse.foreach(JFiles.delete) finally s.close()
    } else JFiles.move(Paths.get(tmp), cur)
  }

  /** Apply one micro-batch of deltas (Z-set frames with weight columns);
    * returns the join's output delta. The delta is materialized to a
    * staging table (distributed write, never a driver collect) BEFORE the
    * state swap, because it must join against the PRE-step A/B; consume it
    * before the next step overwrites the staging area. */
  def step(deltaA: DataFrame, deltaB: DataFrame): DataFrame = {
    val a = readState("a", schemaA)
    val b = readState("b", schemaB)
    val da = ZSet.consolidate(deltaA)
    val db = ZSet.consolidate(deltaB)
    val out = ZSet.joinDelta(a, da, b, db, cond)
    out.write.mode("overwrite").parquet(s"$stateDir/out_delta")
    writeState("a", ZSet.consolidate(a.unionByName(da)))
    writeState("b", ZSet.consolidate(b.unionByName(db)))
    spark.read.schema(out.schema).parquet(s"$stateDir/out_delta")
  }
}
