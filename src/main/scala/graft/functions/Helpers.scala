package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar helper surface (kafi/helpers.py:30-413): millis conversions,
  * base64, zstd, glob matching, nested-path access. Column forms where the
  * operation belongs in a plan; plain Scala forms where it is driver-side
  * utility (the reference uses them for checkpoint payloads).
  */
object Helpers {

  // ---- millis (helpers.py:30-39) ----

  def toMillis(ts: Column): Column = unix_millis(ts.cast("timestamp"))
  def fromMillis(ms: Column): Column = timestamp_millis(ms)
  def nowMillis(): Long = System.currentTimeMillis()

  // ---- base64 (helpers.py:188-215) ----

  def b64Encode(c: Column): Column = base64(c)
  def b64Decode(c: Column): Column = unbase64(c)

  // ---- zstd (helpers.py:408-413; used for checkpoint payloads,
  //      streams.py:133-144). zstd-jni ships with Spark. ----

  def zstdCompress(bytes: Array[Byte], level: Int = 3): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(bytes, level)

  def zstdDecompress(bytes: Array[Byte]): Array[Byte] = {
    val size = com.github.luben.zstd.Zstd.getFrameContentSize(bytes)
    // streaming compressors may omit the content size (negative return);
    // frames >= 2 GiB would wrap toInt negative — both take the streaming
    // path instead of failing on valid input
    if (size > 0 && size <= Int.MaxValue)
      com.github.luben.zstd.Zstd.decompress(bytes, size.toInt)
    else if (size == 0) Array.emptyByteArray
    else {
      // recycling pool: reuse working buffers across streams on a thread
      // instead of a native alloc/free per call (see Archives.zstdAll)
      val in = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(bytes),
        com.github.luben.zstd.RecyclingBufferPool.INSTANCE)
      try in.readAllBytes() finally in.close()
    }
  }

  // ---- glob pattern match (helpers.py:270-280) ----

  def globToRegex(pattern: String): String =
    "^" + pattern.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$"

  def globMatch(s: String, pattern: String): Boolean = s.matches(globToRegex(pattern))

  // ---- nested path get/set (helpers.py:325-334): on JSON payloads the
  //      path-get is get_json_object; on struct columns it is getField
  //      chaining. ----

  def jsonPathGet(c: Column, dotted: String): Column =
    get_json_object(c, "$." + dotted)

  def structPathGet(c: Column, dotted: String): Column =
    dotted.split('.').foldLeft(c)(_ getField _)
}
