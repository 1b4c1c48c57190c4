package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Int8 symmetric embedding quantization — the standard 4× storage/IO
  * shrink for ANN indexes over large corpora (at 100 TB the embedding
  * column IS the dataset; float32→int8 is the difference between a
  * memory-resident index and not). Per-vector scale = max|x|/127, code =
  * clamp(round-half-away(x/scale), ±127): every step is integer-exact and
  * replicated in the DuckDB oracle (q_embed_quantize), so the codec is
  * verified bit-for-bit, not by reconstruction error.
  *
  * Typed mapPartitions kernels (primitive array loops) — the HOF-expression
  * form would be CodegenFallback, interpreted per element (measured ~100×
  * slower on signature kernels; see Dedup scaladoc).
  */
object Quantize {

  /** Round half away from zero, boundary-exact. The usual floor(r + 0.5)
    * idiom is WRONG one ulp below a half-integer: r + 0.5 rounds UP to the
    * boundary in IEEE double (floor(0.49999999999999994 + 0.5) == 1, C/
    * DuckDB round() == 0). Ties are detected exactly instead, on |r| —
    * a - floor(a) is an exact subtraction for a ≥ 0 (Sterbenz: floor(a) ≤
    * a < 2·floor(a) once floor ≥ 1; exact trivially below 1), where the
    * signed form a=-0.49999999999999994 is NOT (fl jumps to -1 and r - fl
    * rounds to exactly 0.5, a false tie). Non-ties have an unambiguous
    * nearest integer that rint returns. */
  private[graft] def roundHalfAway(r: Double): Double = {
    val a = math.abs(r)
    val fl = math.floor(a)
    val v = if (a - fl == 0.5) fl + 1 else math.rint(a)
    math.copySign(v, r)
  }

  /** (passthrough…, scale: double, q: array<byte>) from an array<float>
    * column. Zero vectors get scale 0 and all-zero codes (dequantize
    * restores exact zeros). Null embeddings pass through as null scale/q;
    * a null ELEMENT stays a null code (boxed access — `getAs[Seq[Float]]`
    * would silently unbox null to 0.0f), and a vector with no non-null
    * elements (empty or all-null) gets a null scale, matching the oracle's
    * null-skipping list_max. */
  def quantize(df: DataFrame, embCol: String): DataFrame = {
    val in = df.withColumn(embCol, col(embCol).cast("array<float>"))
    val embIdx = in.schema.fieldIndex(embCol)
    val outSchema = in.schema
      .add("scale", DoubleType, nullable = true)
      .add("q", ArrayType(ByteType), nullable = true)
    in.mapPartitions { rows =>
      rows.map { row =>
        val e = row.getAs[scala.collection.Seq[java.lang.Float]](embIdx)
        if (e == null) Row.fromSeq(row.toSeq ++ Seq(null, null))
        else {
          val n = e.length
          var mx = -1.0 // -1 = no non-null element seen
          var i = 0
          while (i < n) {
            if (e(i) != null) {
              val a = math.abs(e(i).toDouble); if (a > mx) mx = a
            }
            i += 1
          }
          val scale: java.lang.Double = if (mx < 0) null else mx / 127.0
          val q = new Array[Any](n)
          i = 0
          while (i < n) {
            q(i) =
              if (e(i) == null) null
              else if (scale > 0) {
                val v = roundHalfAway(e(i).toDouble / scale)
                math.max(-127.0, math.min(127.0, v)).toByte
              } else 0.toByte
            i += 1
          }
          // Seq, not a raw Array[Byte]: RowEncoder reads a bare byte
          // array as BinaryType and rejects it for array<tinyint>
          Row.fromSeq(row.toSeq ++ Seq(scale, q.toIndexedSeq))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Reconstruct array<float> from (scale, q) — `as` names the restored
    * column. code × scale, truncated to float32 exactly as the oracle's
    * CAST(v AS FLOAT); null codes dequantize to null elements. */
  def dequantize(df: DataFrame, scaleCol: String, qCol: String, as: String): DataFrame = {
    val sIdx = df.schema.fieldIndex(scaleCol)
    val qIdx = df.schema.fieldIndex(qCol)
    val outSchema = df.schema.add(as, ArrayType(FloatType), nullable = true)
    df.mapPartitions { rows =>
      rows.map { row =>
        if (row.isNullAt(sIdx) || row.isNullAt(qIdx)) Row.fromSeq(row.toSeq :+ null)
        else {
          val scale = row.getDouble(sIdx)
          val q = row.getAs[scala.collection.Seq[java.lang.Byte]](qIdx)
          val out = new Array[Any](q.length)
          var i = 0
          while (i < q.length) {
            out(i) = if (q(i) == null) null else (q(i).toDouble * scale).toFloat
            i += 1
          }
          Row.fromSeq(row.toSeq :+ out.toIndexedSeq)
        }
      }
    }(Encoders.row(outSchema))
  }
}
