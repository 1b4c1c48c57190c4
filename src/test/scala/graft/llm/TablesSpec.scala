package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** HTML table extraction (round 13). */
class TablesSpec extends AnyFunSuite {

  test("cells: coordinates, th flag, colspan arithmetic, entities") {
    val cs = Tables.parseTables(
      "<table><tr><th>A</th><th>B</th></tr>" +
        "<tr><td colspan='2'>wide</td><td>tail</td></tr>" +
        "<tr><td>x&amp;y</td><td>z</td></tr></table>")
    assert(cs.map(c => (c.row_idx, c.col_idx, c.is_header, c.text)) == Seq(
      (0, 0, true, "A"), (0, 1, true, "B"),
      (1, 0, false, "wide"), (1, 2, false, "tail"),
      (2, 0, false, "x&y"), (2, 1, false, "z")))
  }

  test("nested tables: inner cells go to the inner table only") {
    val cs = Tables.parseTables(
      "<table><tr><td>outer1</td><td><table><tr><td>inner</td></tr></table></td>" +
        "<td>outer2</td></tr></table>")
    val byTable = cs.groupBy(_.table_idx)
    assert(byTable(0).map(_.text) == Seq("inner"))
    // the outer row keeps its non-nested cells (the nested region is cut out)
    assert(byTable(1).map(_.text) == Seq("outer1", "", "outer2"))
  }

  test("multiple tables in document order; markup inside cells strips") {
    val cs = Tables.parseTables(
      "<p>x</p><table><tr><td><b>bold</b> cell</td></tr></table>" +
        "<div><table><tr><th>second</th></tr></table></div>")
    assert(cs.map(c => (c.table_idx, c.text)) == Seq((0, "bold cell"), (1, "second")))
  }

  test("tag soup degrades, never throws") {
    assert(Tables.parseTables(null).isEmpty)
    assert(Tables.parseTables("no tables").isEmpty)
    assert(Tables.parseTables("<table><tr><td>unclosed").isEmpty) // no </table>
    assert(Tables.parseTables("<table></table>").isEmpty)
    // a row with no cells contributes nothing but keeps numbering
    val cs = Tables.parseTables("<table><tr></tr><tr><td>c</td></tr></table>")
    assert(cs.map(c => (c.row_idx, c.text)) == Seq((1, "c")))
  }
}
