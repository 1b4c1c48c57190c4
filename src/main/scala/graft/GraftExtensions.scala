package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, Expression, ExpressionInfo, Literal, ShiftLeft, ShiftRightUnsigned}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
import graft.functions.{CosineSimilarity, ZOrder}

/** SparkSessionExtensions entry point: makes the engine's native Catalyst
  * expressions visible to SQL, so `spark.sql("... cosine_similarity(a, b)
  * ...")` plans the codegen'd expression — not a UDF — on any session
  * built with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)`). Arguments are cast to
  * array<float> inside the builder, mirroring what `Exprs.cosine` does at
  * the Column layer, so SQL callers get the same float→double arithmetic
  * contract the oracles verify. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq((
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, null,
      "cosine_similarity", "cosine_similarity(a, b) - cosine of two float vectors", ""),
    (children: Seq[Expression]) => {
      require(children.length == 2, "cosine_similarity(a, b) takes exactly two arguments")
      CosineSimilarity(
        Cast(children.head, ArrayType(FloatType)),
        Cast(children(1), ArrayType(FloatType)))
    }), (
    FunctionIdentifier("zorder_interleave"),
    new ExpressionInfo(ZOrder.getClass.getName, null, "zorder_interleave",
      "zorder_interleave(x, y, bits) - Morton bit-interleave of two non-negative ints; bits must be a literal in [1, 31]", ""),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        "zorder_interleave(x, y, bits) takes exactly three arguments")
      require(children(2).foldable, "zorder_interleave: bits must be a literal")
      val bits = children(2).eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"zorder_interleave: bits must be an integer literal, got $other")
      }
      require(bits >= 1 && bits <= 31, "zorder_interleave: bits in [1, 31]")
      // same composed bit-intrinsic tree as ZOrder.interleave, built at
      // the catalyst layer (the Column bridge yields an unresolved node
      // that SQL function injection cannot resolve); PlanSpec asserts the
      // two forms agree row-for-row so they cannot drift
      def bitAt(x: Expression, i: Int, pos: Int): Expression =
        ShiftLeft(BitwiseAnd(
          ShiftRightUnsigned(Cast(x, LongType), Literal(i)), Literal(1L)), Literal(pos))
      (0 until bits).flatMap(i => Seq(
          bitAt(children.head, i, 2 * i), bitAt(children(1), i, 2 * i + 1)))
        .reduce[Expression](BitwiseOr(_, _))
    }))

  /** Register into an ALREADY-BUILT session (tests, notebooks). Sessions
    * configured with spark.sql.extensions don't need this. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
