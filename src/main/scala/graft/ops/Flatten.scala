package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** explode_normalize — recursive flattening of nested structs/arrays into
  * flat columns (kafi/helpers.py:283-303, pandas json_normalize +
  * explode loop in kafi/pandas.py:13-28).
  *
  * Struct fields flatten to `parent_field` columns; arrays explode_outer
  * (row-preserving for empty/null arrays). Loops until the schema is flat.
  * Pure narrow transformations — no shuffle at any step.
  */
object Flatten {

  def explodeNormalize(df: DataFrame): DataFrame = {
    var cur = df
    var changed = true
    while (changed) {
      changed = false
      val schema = cur.schema
      // one struct or array at a time, leftmost-first, until fixpoint
      schema.fields.find(f =>
        f.dataType.isInstanceOf[StructType] || f.dataType.isInstanceOf[ArrayType]) match {
        case Some(f) =>
          changed = true
          f.dataType match {
            case st: StructType =>
              val others = cur.columns.filterNot(_ == f.name)
              // `parent_field` can collide with an existing column (e.g.
              // `user_id` next to `user: struct<id>`); suffix until unique so
              // the output never carries duplicate names that blow up the
              // first downstream reference with AMBIGUOUS_REFERENCE
              val taken = scala.collection.mutable.Set[String](others: _*)
              val flat = st.fieldNames.map { n =>
                var name = s"${f.name}_$n"
                while (taken(name)) name += "_"
                taken += name
                col(s"`${f.name}`.`$n`").as(name)
              }
              cur = cur.select(others.map(col) ++ flat: _*)
            case _: ArrayType =>
              val others = cur.columns.filterNot(_ == f.name).map(col)
              cur = cur.select(others :+ explode_outer(col(s"`${f.name}`")).as(f.name): _*)
            case _ =>
          }
        case None =>
      }
    }
    cur
  }
}
