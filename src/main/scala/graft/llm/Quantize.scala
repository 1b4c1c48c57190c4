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

  /** (passthrough…, scale: double, q: array<byte>) from an array<float>
    * column. Zero vectors get scale 0 and all-zero codes (dequantize
    * restores exact zeros). Null embeddings pass through as null scale/q. */
  def quantize(df: DataFrame, embCol: String): DataFrame = {
    val in = df.withColumn(embCol, col(embCol).cast("array<float>"))
    val embIdx = in.schema.fieldIndex(embCol)
    val outSchema = in.schema
      .add("scale", DoubleType, nullable = true)
      .add("q", ArrayType(ByteType), nullable = true)
    in.mapPartitions { rows =>
      rows.map { row =>
        val e = row.getAs[scala.collection.Seq[Float]](embIdx)
        if (e == null) Row.fromSeq(row.toSeq ++ Seq(null, null))
        else {
          val n = e.length
          var mx = 0.0
          var i = 0
          while (i < n) { val a = math.abs(e(i).toDouble); if (a > mx) mx = a; i += 1 }
          val scale = mx / 127.0
          val q = new Array[Byte](n)
          if (scale > 0) {
            i = 0
            while (i < n) {
              // round half away from zero, exactly like DuckDB's round()
              val r = e(i).toDouble / scale
              val v = if (r >= 0) math.floor(r + 0.5) else math.ceil(r - 0.5)
              q(i) = math.max(-127.0, math.min(127.0, v)).toByte
              i += 1
            }
          }
          // Seq, not the raw Array[Byte]: RowEncoder reads a bare byte
          // array as BinaryType and rejects it for array<tinyint>
          Row.fromSeq(row.toSeq ++ Seq(scale, q.toIndexedSeq))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Reconstruct array<float> from (scale, q) — `as` names the restored
    * column. code × scale, truncated to float32 exactly as the oracle's
    * CAST(v AS FLOAT). */
  def dequantize(df: DataFrame, scaleCol: String, qCol: String, as: String): DataFrame = {
    val sIdx = df.schema.fieldIndex(scaleCol)
    val qIdx = df.schema.fieldIndex(qCol)
    val outSchema = df.schema.add(as, ArrayType(FloatType), nullable = true)
    df.mapPartitions { rows =>
      rows.map { row =>
        if (row.isNullAt(sIdx) || row.isNullAt(qIdx)) Row.fromSeq(row.toSeq :+ null)
        else {
          val scale = row.getDouble(sIdx)
          val q = row.getAs[scala.collection.Seq[Byte]](qIdx)
          val out = new Array[Float](q.length)
          var i = 0
          while (i < q.length) { out(i) = (q(i) * scale).toFloat; i += 1 }
          Row.fromSeq(row.toSeq :+ out)
        }
      }
    }(Encoders.row(outSchema))
  }
}
