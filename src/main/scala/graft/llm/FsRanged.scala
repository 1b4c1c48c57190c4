package graft.llm

import org.apache.spark.sql.{Dataset, Encoder}

/** The ONE ranged-read scaffold (round 15) — extracted from
  * [[Wiki.slicePagesFs]] when [[Warc.fetchRecords]] needed the same
  * ~30 lines, so the open/close machinery and its hardening live once:
  *
  *  - one Hadoop FS stream per DISTINCT path per task, positioned
  *    reads only (thread-safe, seek-free);
  *  - FAILED opens are cached too (as None) — a dead path referenced
  *    by thousands of rows costs ONE open attempt per task, not one
  *    RPC per row;
  *  - every stream closes on every task exit path: the drain-close on
  *    the wrapping iterator is the fast path, the
  *    TaskCompletionListener the backstop for partial consumption
  *    (limit/take) and task aborts — the r14 FS-slice hardening,
  *    applied here exactly once;
  *  - a row whose read or parse fails contributes nothing (the
  *    corrupt-input posture), never a task failure.
  */
private[graft] object FsRanged {

  /** Map each `(row, path)` through `read` against the path's cached
    * stream. `read` must be TOTAL over its own failure modes wherever
    * a partial result should survive; exceptions it lets escape skip
    * just that row. */
  def mapRanged[T, R: Encoder](rows: Dataset[(T, String)])(
      read: (org.apache.hadoop.fs.FSDataInputStream, T) => Iterator[R]): Dataset[R] = {
    rows.mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      val opened = scala.collection.mutable.LinkedHashMap
        .empty[String, Option[org.apache.hadoop.fs.FSDataInputStream]]
      def streamFor(path: String): Option[org.apache.hadoop.fs.FSDataInputStream] =
        opened.getOrElseUpdate(path,
          try {
            val p = new org.apache.hadoop.fs.Path(path)
            Some(p.getFileSystem(conf).open(p))
          } catch { case scala.util.control.NonFatal(_) => None })
      val out = it.flatMap { case (row, path) =>
        streamFor(path) match {
          case Some(in) =>
            try read(in, row)
            catch { case scala.util.control.NonFatal(_) => Iterator.empty }
          case None => Iterator.empty
        }
      }
      def closeAll(): Unit = {
        opened.values.flatten.foreach(in =>
          try in.close() catch { case scala.util.control.NonFatal(_) => () })
        opened.clear()
      }
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => closeAll()))
      new Iterator[R] {
        def hasNext: Boolean = {
          val h = out.hasNext
          if (!h) closeAll()
          h
        }
        def next(): R = out.next()
      }
    }
  }
}
