package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.functions.CosineSimilarity

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
    }))

  /** Register into an ALREADY-BUILT session (tests, notebooks). Sessions
    * configured with spark.sql.extensions don't need this. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
