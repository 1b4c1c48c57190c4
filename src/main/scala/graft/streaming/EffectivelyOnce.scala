package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Effectively-once foreachBatch output — SURVEY §7.4 item 5.
  *
  * The reference's streams runtime gets effectively-once delivery by
  * checkpoint-THEN-commit choreography: persist the source offsets, then
  * commit the consumer group, so a crash between the two replays from the
  * checkpoint instead of losing or doubling work (streams.py:260-271).
  * Structured Streaming already owns the source-offset half (the query
  * checkpoint); what a non-transactional sink still needs is the OTHER
  * half — making the replayed micro-batch a no-op at the sink.
  *
  * [[skipCommitted]] supplies it with the standard batch-id commit log:
  * the wrapped body runs only if no marker exists for the batch id, and
  * the marker is created atomically AFTER the body succeeds. The crash
  * window (sink write done, SS checkpoint commit not yet) therefore
  * replays into a skip — rows land exactly once. A crash BEFORE the
  * marker re-runs the body, so the body itself must be atomic-or-
  * overwriting per batch (e.g. write to a per-batch path, or overwrite
  * mode) — the same contract every foreachBatch exactly-once recipe
  * carries, made explicit here.
  *
  * Scale note: the commit log is one zero-byte file per micro-batch in
  * ONE driver-side create call — no executor coordination, no listing on
  * the hot path (existence check + create), and it composes with any
  * sink including multi-sink demux (wrap the whole demux body once; N
  * filtered writes commit atomically together from the replay's view).
  */
object EffectivelyOnce {

  /** Wrap a foreachBatch body so replays of an already-committed batch id
    * are skipped. `commitDir` must be stable across restarts (like the
    * query checkpoint dir — any Hadoop-FS URI works: file://, s3a://,
    * abfss://).
    *
    * Atomicity scope: the "exactly one create wins" race note below holds
    * on filesystems with atomic create-if-absent (HDFS, local, abfss —
    * where `create(overwrite=false)` is a namespace operation). S3 has no
    * atomic create-if-absent, so on s3a the exists+create pair is
    * best-effort against CONCURRENT writers. Structured Streaming's
    * driver runs foreachBatch single-threaded per query — one writer —
    * so the single-query case this wraps is safe on any store; only two
    * simultaneously-live drivers on the same checkpoint (a split-brain SS
    * deployment error in itself) could double-commit on S3. */
  def skipCommitted(commitDir: String)(body: (DataFrame, Long) => Unit):
      (DataFrame, Long) => Unit = { (df, batchId) =>
    val dir = new Path(commitDir)
    val fs = dir.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    val marker = new Path(dir, s"batch-$batchId")
    if (!fs.exists(marker)) {
      body(df, batchId)
      fs.mkdirs(dir)
      // overwrite=false: if two attempts race, exactly one create wins —
      // the loser's rows were the same batch, so either marker is correct
      fs.create(marker, false).close()
    }
  }
}
