package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** RTF extraction (round 13): group/destination semantics, escapes,
  * the fixture sweep, and the never-throw posture. */
class RtfSpec extends AnyFunSuite {

  private def t(s: String): String = Rtf.rtfText(s)

  test("destinations and ignorable groups never leak; formatting groups do not split text") {
    assert(t("{\\rtf1{\\fonttbl{\\f0 Helvetica;}}body}") == "body")
    assert(t("{\\rtf1{\\info{\\title secret}}visible}") == "visible")
    assert(t("{\\rtf1{\\*\\generator tool 9;}kept}") == "kept")
    // \b consumes its delimiter space, so the bold group splits nothing
    assert(t("{\\rtf1 a{\\b bold}c}") == "aboldc")
    assert(t("{\\rtf1 pre {\\i ital} post}") == "pre ital post")
  }

  test("control words and escapes") {
    assert(t("{\\rtf1 one\\par two\\line three}") == "one two three")
    assert(t("{\\rtf1 a\\tab b}") == "a b")
    assert(t("{\\rtf1 50\\'25 and \\'e9}") == "50% and é")
    assert(t("{\\rtf1 \\u8212?dash}") == "—dash") // '?' fallback skipped
    assert(t("{\\rtf1 \\u233\\'e9 x}") == "é x") // \'hh fallback skipped too
    assert(t("{\\rtf1 br\\{ace\\}s \\\\slash}") == "br{ace}s \\slash")
    assert(t("{\\rtf1 nb\\~sp}") == "nb sp")
    assert(t("{\\rtf1 line\r\nwrap}") == "linewrap") // raw EOL is writer wrapping
    assert(t("{\\rtf1\\fs24 param words vanish}") == "param words vanish")
  }

  test("fixture sweep matches the oracle's closed form") {
    for (id <- 0L until 120L) {
      val paras = (0 until (1 + id % 2).toInt).map(k =>
        s"R$k D$id pct 50 end ${(id * 3 + k) % 71}")
      val uni = if (id % 4 == 1) Some(s"Café — d${id % 10}") else None
      val exp = (paras ++ uni.toSeq).mkString(" ")
      assert(t(new String(Rtf.syntheticRtf(paras, uni), "ISO-8859-1")) == exp,
        s"rtf text at id=$id")
    }
  }

  test("never a throw: non-rtf, truncations, hostile input") {
    assert(t(null) == "")
    assert(t("plain text") == "")
    assert(t("{\\rtf1 never closed") == "never closed")
    val good = new String(Rtf.syntheticRtf(Seq("para one", "para two"),
      Some("uni — é")), "ISO-8859-1")
    for (cut <- Seq(8, good.length / 3, good.length / 2, good.length - 2))
      Rtf.rtfText(good.substring(0, cut)) // must not throw
    val rng = new scala.util.Random(11)
    for (_ <- 0 until 200) {
      val s = "{\\rtf1" + (0 until 60).map(_ =>
        "\\{}'u*ab 0-;\n~".charAt(rng.nextInt(14))).mkString
      Rtf.rtfText(s) // must not throw
    }
  }
}
