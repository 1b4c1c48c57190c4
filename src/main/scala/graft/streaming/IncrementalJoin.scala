package graft.streaming

import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
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
  * State is VERSIONED: each step writes both sides into a fresh
  * `v<n>/` directory and then atomically swaps a pointer file. A crash at
  * any instant leaves the pointer on the previous complete version, so a
  * foreachBatch replay of the same deltas recomputes v<n> from unchanged
  * v<n-1> state — idempotent, never a half-applied A-without-B step. The
  * per-step consolidate is the analogue of `evaluator.compact()` in the
  * reference's `latest` (topologynode.py:1110-1129). Each step's cost is
  * O(|Δ| · matched), never a recomputation of A ⋈ B; retractions flow
  * through the weights unchanged.
  */
class IncrementalJoin(
    spark: SparkSession,
    stateDir: String,
    schemaA: StructType,
    schemaB: StructType,
    cond: Column) {

  private val pointer = Paths.get(s"$stateDir/CURRENT")

  private def currentVersion: Long =
    if (JFiles.exists(pointer)) JFiles.readString(pointer).trim.toLong else 0L

  private def versionDir(v: Long) = s"$stateDir/v$v"

  private def readState(v: Long, side: String, schema: StructType): DataFrame = {
    val p = s"${versionDir(v)}/$side"
    if (v > 0 && JFiles.exists(Paths.get(p))) spark.read.schema(schema).parquet(p)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private def deleteDir(p: java.nio.file.Path): Unit =
    if (JFiles.exists(p)) {
      val s = JFiles.walk(p)
      try s.iterator().asScala.toSeq.reverse.foreach(JFiles.delete) finally s.close()
    }

  /** Apply one micro-batch of deltas (Z-set frames with weight columns);
    * returns the join's output delta (staged under the new version —
    * consume before the next step). Safe to replay the same batch after a
    * crash: the pointer only advances once the full version is on disk. */
  def step(deltaA: DataFrame, deltaB: DataFrame): DataFrame = {
    val v = currentVersion
    val a = readState(v, "a", schemaA)
    val b = readState(v, "b", schemaB)
    val da = ZSet.consolidate(deltaA)
    val db = ZSet.consolidate(deltaB)
    val next = v + 1
    deleteDir(Paths.get(versionDir(next))) // clear any half-written replay residue
    val out = ZSet.joinDelta(a, da, b, db, cond)
    out.write.mode("overwrite").parquet(s"${versionDir(next)}/out")
    ZSet.consolidate(a.unionByName(da)).write.parquet(s"${versionDir(next)}/a")
    ZSet.consolidate(b.unionByName(db)).write.parquet(s"${versionDir(next)}/b")
    // atomic pointer swap — the commit point
    JFiles.createDirectories(pointer.getParent)
    val tmp = Paths.get(s"$stateDir/CURRENT.tmp")
    JFiles.writeString(tmp, next.toString)
    JFiles.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // GC: sweep EVERY version older than next-1, not just v-1 — a crash
    // between a past swap and its GC leaves an orphan that a fixed v-1
    // delete would never revisit.
    val vName = "v(\\d+)".r
    val entries = JFiles.list(Paths.get(stateDir))
    try entries.iterator().asScala.toSeq.foreach { p =>
      p.getFileName.toString match {
        case vName(n) if n.toLong < next - 1 => deleteDir(p)
        case _ => ()
      }
    } finally entries.close()
    spark.read.schema(out.schema).parquet(s"${versionDir(next)}/out")
  }
}
