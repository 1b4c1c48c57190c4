package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Notebook cell extraction (round 13): the declarative from_json +
  * posexplode path — dual-schema source coalesce, schema projection of
  * outputs/metadata, corrupt-JSON posture, code-cell order. */
class NotebookSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "json")
  }

  test("array-form and string-form source land on the same text") {
    val text = "line one\nline two\nend"
    val arr = Notebooks.syntheticIpynb(Seq(("code", text, true)))
    val str = Notebooks.syntheticIpynb(Seq(("code", text, false)))
    val got = Notebooks.cells(df(Seq((1L, arr), (2L, str))), "doc_id", col("json"))
      .orderBy("doc_id")
      .select("doc_id", "cell_type", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "code", text, text.length.toLong),
      (2L, "code", text, text.length.toLong)))
  }

  test("mixed-form cells in ONE notebook coalesce by position") {
    val nb = Notebooks.syntheticIpynb(Seq(
      ("markdown", "# head", true),
      ("code", "a = 1\nb = 2", false),
      ("code", "print(a)", true)))
    val got = Notebooks.cells(df(Seq((7L, nb))), "doc_id", col("json"))
      .orderBy("cell_idx")
      .select("cell_idx", "cell_type", "source")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (0, "markdown", "# head"), (1, "code", "a = 1\nb = 2"), (2, "code", "print(a)")))
  }

  test("outputs/metadata are schema-projected away; escapes round-trip") {
    // quotes, backslashes, tabs and non-ASCII through the JSON layer
    val tricky = "s = \"q\\\"t\"\n\tx = '\\\\'"
    val nb = Notebooks.syntheticIpynb(Seq(("code", tricky, true)))
    assert(nb.contains("outputs")) // the noise is really in the JSON
    val got = Notebooks.cells(df(Seq((1L, nb))), "doc_id", col("json"))
      .select("source").collect().head.getString(0)
    assert(got == tricky)
  }

  test("corrupt JSON emits zero cells, never a throw") {
    val rows = Seq(
      (1L, "{not json"),
      (2L, """{"cells": "not an array"}"""),
      (3L, """{"cells": null}"""),
      (4L, Notebooks.syntheticIpynb(Seq(("code", "ok", true)))))
    val got = Notebooks.cells(df(rows), "doc_id", col("json"))
      .select("doc_id", "source").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((4L, "ok")))
  }

  test("codeText keeps cell order and code cells only") {
    val nb = Notebooks.syntheticIpynb(Seq(
      ("code", "first", true), ("markdown", "skip", true),
      ("code", "second", false), ("code", "third", true)))
    val got = Notebooks.codeText(df(Seq((3L, nb))), "doc_id", col("json"))
      .select("code").collect().head.getString(0)
    assert(got == "first\nsecond\nthird")
  }

  test("fixture sweep matches the oracle's closed forms") {
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 5L, 7L, 10L, 13L)) {
      val exp = (0 until (2 + id % 3).toInt).map { k =>
        val tpe = if ((id + k) % 2 == 0) "code" else "markdown"
        val src = (0 until (1 + (id + k) % 3).toInt).map(j => s"x$k$j d$id").mkString("\n")
        (k, tpe, src)
      }
      val got = Notebooks.cells(
          df(Seq((id, graft.queries.LlmQueries.ipynbJson(id)))), "doc_id", col("json"))
        .orderBy("cell_idx")
        .select("cell_idx", "cell_type", "source")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      assert(got.toSeq == exp, s"cells at id=$id")
    }
  }
}
