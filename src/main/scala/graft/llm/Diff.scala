package graft.llm

import org.apache.spark.sql.Dataset

import graft.llm.Multimodal.Media

/** Unified-diff ingestion (round 13): commit corpora (The Stack's
  * commits slice, CommitPack and friends) ship changes as unified
  * diffs — so the code-corpus pipeline needs the diff walked into
  * hunks, the added/removed sides extracted for training text, and —
  * for before/after pair mining — the patch APPLIED against the old
  * blob. All three are pure framing over the public format (`---`/
  * `+++` file headers, `@@ -a,b +c,d @@` hunk headers, ±/space/`\`
  * body lines): structural in the decision-record sense.
  *
  * Apply posture: context and removed lines are VERIFIED against the
  * original; any mismatch returns None for that file (an honest
  * failed-patch, the git `.rej` analogue) rather than silently
  * emitting a half-applied blob — at corpus scale a truncated or
  * re-flowed diff is normal input.
  *
  * Pure flatMap/map kernels; diff bytes never shuffle.
  */
object Diff {

  /** One hunk of one file. `added`/`removed` count body lines. */
  case class DiffHunk(doc_id: Long, file_path: String, hunk_idx: Int,
      old_start: Int, old_len: Int, new_start: Int, new_len: Int,
      added: Int, removed: Int)

  /** Parsed representation kept private: per file, hunks with bodies. */
  private[graft] case class Hunk(oldStart: Int, oldLen: Int, newStart: Int,
      newLen: Int, lines: Seq[String])

  private val ReHunk = java.util.regex.Pattern.compile(
    "^@@ -(\\d+)(?:,(\\d+))? \\+(\\d+)(?:,(\\d+))? @@")

  /** Diff text → (file path from the `+++` side, hunks). Files whose
    * headers never appear are skipped; a malformed hunk header ends
    * that file's walk (prefix rule). */
  private[graft] def parseDiff(text: String): Seq[(String, Seq[Hunk])] = {
    if (text == null) return Nil
    val lines = text.split("\n", -1)
    val out = Seq.newBuilder[(String, Seq[Hunk])]
    var i = 0
    val n = lines.length
    while (i < n) {
      if (lines(i).startsWith("+++ ")) {
        val rawPath = lines(i).substring(4).trim
        val path = if (rawPath.startsWith("b/")) rawPath.substring(2) else rawPath
        i += 1
        val hunks = Seq.newBuilder[Hunk]
        var fileDone = false
        while (!fileDone && i < n) {
          val m = ReHunk.matcher(lines(i))
          if (m.find()) {
            val os = m.group(1).toInt
            val ol = Option(m.group(2)).map(_.toInt).getOrElse(1)
            val ns = m.group(3).toInt
            val nl = Option(m.group(4)).map(_.toInt).getOrElse(1)
            i += 1
            // count-based framing (the hunk header DECLARES how many
            // old/new-side lines follow — the Content-Length of diffs),
            // so added content that itself starts with "+++"/"---"
            // cannot be mistaken for a file header
            val body = Seq.newBuilder[String]
            var oldSeen = 0
            var newSeen = 0
            var ok = true
            while (ok && (oldSeen < ol || newSeen < nl) && i < n) {
              val l = lines(i)
              if (l.startsWith("\\")) { body += l; i += 1 }
              else if (l.startsWith("-")) { oldSeen += 1; body += l; i += 1 }
              else if (l.startsWith("+")) { newSeen += 1; body += l; i += 1 }
              else if (l.startsWith(" ") || l.isEmpty) {
                // bare empty = blank context line (re-flowed diffs)
                oldSeen += 1; newSeen += 1
                body += (if (l.isEmpty) " " else l); i += 1
              } else ok = false
            }
            while (ok && i < n && lines(i).startsWith("\\")) { body += lines(i); i += 1 }
            // a truncated hunk (declared counts never satisfied) is
            // dropped whole — prefix rule, same as every other walk
            if (ok && oldSeen == ol && newSeen == nl)
              hunks += Hunk(os, ol, ns, nl, body.result())
            else fileDone = true
          } else if (lines(i).startsWith("--- ") || lines(i).startsWith("diff ") ||
            lines(i).startsWith("index ") || lines(i).isEmpty) {
            if (lines(i).startsWith("--- ") || lines(i).startsWith("diff ")) fileDone = true
            else i += 1
          } else fileDone = true
        }
        out += (path -> hunks.result())
      } else i += 1
    }
    out.result()
  }

  /** Diff blobs → hunk rows, a pure flatMap kernel. */
  def diffHunks(ds: Dataset[Media]): Dataset[DiffHunk] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { m =>
      val text = new String(m.media, java.nio.charset.StandardCharsets.UTF_8)
      parseDiff(text).flatMap { case (path, hunks) =>
        hunks.zipWithIndex.map { case (h, ix) =>
          DiffHunk(m.doc_id, path, ix, h.oldStart, h.oldLen, h.newStart, h.newLen,
            h.lines.count(l => l.startsWith("+")),
            h.lines.count(l => l.startsWith("-")))
        }
      }
    })
  }

  /** Added-side text per file — the corpus-extraction op (train on
    * what the commit introduced). */
  def addedText(ds: Dataset[Media]): Dataset[(Long, String, String)] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { m =>
      val text = new String(m.media, java.nio.charset.StandardCharsets.UTF_8)
      parseDiff(text).map { case (path, hunks) =>
        val added = hunks.flatMap(_.lines).collect {
          case l if l.startsWith("+") => l.substring(1)
        }
        (m.doc_id, path, added.mkString("\n"))
      }
    })
  }

  /** Apply one file's hunks to `original`. Context and removed lines
    * verify against the original; None on any mismatch. Line numbers
    * in hunk headers are 1-based per the format. */
  private[graft] def applyHunks(original: String, hunks: Seq[Hunk]): Option[String] = {
    val src = original.split("\n", -1)
    val out = Seq.newBuilder[String]
    var pos = 0 // 0-based index into src
    hunks.foreach { h =>
      val start = h.oldStart - 1
      if (start < pos || start > src.length) return None
      while (pos < start) { out += src(pos); pos += 1 }
      h.lines.foreach { l =>
        if (l.startsWith(" ") || l.startsWith("-")) {
          if (pos >= src.length || src(pos) != l.substring(1)) return None
          if (l.startsWith(" ")) out += src(pos)
          pos += 1
        } else if (l.startsWith("+")) out += l.substring(1)
        // "\ No newline at end of file" markers carry no content
      }
    }
    while (pos < src.length) { out += src(pos); pos += 1 }
    Some(out.result().mkString("\n"))
  }

  /** (old blob, diff) → patched blob per file; `ok = 0` rows carry the
    * honest failure (null text) instead of a half-applied blob.
    * `originals` maps file path → old content (broadcast by Spark as
    * part of the closure — the caller bounds it). */
  def applyPatches(ds: Dataset[Media], originals: Map[String, String]):
      Dataset[(Long, String, Int, String)] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { m =>
      val text = new String(m.media, java.nio.charset.StandardCharsets.UTF_8)
      parseDiff(text).map { case (path, hunks) =>
        originals.get(path).flatMap(o => applyHunks(o, hunks)) match {
          case Some(patched) => (m.doc_id, path, 1, patched)
          case None => (m.doc_id, path, 0, null: String)
        }
      }
    })
  }

  /** A unified diff: per file, (path, hunks = (oldStart, context-
    * before, removed, added, context-after)) rendered with correct
    * `@@` arithmetic — the fixture derives newStart from the running
    * line delta exactly as git does. */
  def syntheticDiff(files: Seq[(String, Seq[(Int, Seq[String], Seq[String], Seq[String], Seq[String])])]): Array[Byte] = {
    val sb = new java.lang.StringBuilder
    files.foreach { case (path, hunks) =>
      sb.append(s"diff --git a/$path b/$path\n")
      sb.append(s"index 0000000..1111111 100644\n")
      sb.append(s"--- a/$path\n")
      sb.append(s"+++ b/$path\n")
      var delta = 0
      hunks.foreach { case (oldStart, pre, removed, added, post) =>
        val oldLen = pre.length + removed.length + post.length
        val newLen = pre.length + added.length + post.length
        val newStart = oldStart + delta
        sb.append(s"@@ -$oldStart,$oldLen +$newStart,$newLen @@\n")
        pre.foreach(l => sb.append(" ").append(l).append('\n'))
        removed.foreach(l => sb.append("-").append(l).append('\n'))
        added.foreach(l => sb.append("+").append(l).append('\n'))
        post.foreach(l => sb.append(" ").append(l).append('\n'))
        delta += added.length - removed.length
      }
    }
    sb.toString.getBytes("UTF-8")
  }
}
