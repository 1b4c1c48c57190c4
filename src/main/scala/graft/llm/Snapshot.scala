package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot corpus diffing — the incremental-refresh primitive.
  *
  * A 100 TB training corpus is rebuilt from crawls repeatedly; reprocessing
  * everything per refresh wastes the cluster. The standard move is a
  * content-hash diff between the previous snapshot and the new one:
  * `added` and `changed` rows flow into the (expensive) cleaning/dedup/
  * packing pipeline, `removed` ids retract downstream artifacts, and the
  * `unchanged` majority is carried forward untouched.
  *
  * Scale shape: both sides reduce to slim (id, sha2) rows BEFORE the
  * full-outer join — the join shuffles 40-byte rows keyed by id, never
  * document text, and Catalyst prunes every other column off both scans
  * (ReadSchema shows only the id and content columns). One shuffle per
  * side; the status is a codegen'd case over the join's null pattern.
  */
object Snapshot {

  /** Diff `newDf` against `oldDf` by `idCol`, comparing `contentCol` via
    * sha2-256. Output: (idCol, status ∈ added|removed|changed|unchanged).
    * A null content hashes like any value (sha2 of NULL is NULL; two NULL
    * contents compare EQUAL via the null-safe compare — an id whose
    * content stays missing is `unchanged`, not forever `changed`). */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, contentCol: String): DataFrame = {
    def slim(df: DataFrame, hashName: String) = df.select(
      col(idCol).cast("long").as(idCol),
      sha2(col(contentCol).cast("string"), 256).as(hashName))
    val o = slim(oldDf, "__oh").withColumnRenamed(idCol, "__oid")
    val n = slim(newDf, "__nh").withColumnRenamed(idCol, "__nid")
    o.join(n, col("__oid") === col("__nid"), "full_outer")
      .select(
        coalesce(col("__nid"), col("__oid")).as(idCol),
        when(col("__oid").isNull, lit("added"))
          .when(col("__nid").isNull, lit("removed"))
          .when(col("__oh") <=> col("__nh"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** The refresh working set: the full `newDf` rows whose content is new
    * or different — what actually enters the pipeline. A LEFT SEMI join on
    * the slim diff ids keeps document payloads out of the diff shuffle. */
  def refreshSet(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, contentCol: String): DataFrame = {
    val ids = corpusDiff(oldDf, newDf, idCol, contentCol)
      .filter(col("status").isin("added", "changed"))
      .select(col(idCol))
    newDf.join(ids, Seq(idCol), "left_semi")
  }
}
