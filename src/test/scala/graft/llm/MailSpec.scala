package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** mbox/MIME walk (round 13): header unfolding + encoded-words, the
  * three transfer encodings, multipart selection, mboxrd framing, and
  * the corrupt-input posture. */
class MailSpec extends AnyFunSuite {

  test("header unfolding and encoded-words (B, Q, adjacency rule)") {
    val hdrs = Mail.parseHeaders("A: one\n two\nB: x\n\nbody", 0).get._1
    assert(hdrs("a") == "one two" && hdrs("b") == "x")
    assert(Mail.decodeWords("=?utf-8?B?aGVsbG8=?= world") == "hello world")
    assert(Mail.decodeWords("=?utf-8?Q?a_b=3Dc?=") == "a b=c")
    // whitespace between two adjacent encoded-words is transparent
    assert(Mail.decodeWords("=?utf-8?Q?ab?= =?utf-8?Q?cd?=") == "abcd")
    assert(Mail.decodeWords("x =?utf-8?Q?ab?= y") == "x ab y")
    // undecodable word stays verbatim (fail-open)
    assert(Mail.decodeWords("=?utf-8?B?!!!?=") == "=?utf-8?B?!!!?=")
    // non-ASCII through a B-word
    assert(Mail.decodeWords("=?utf-8?B?w6l0w6k=?=") == "été")
    // round 15: the full JVM charset table — a Shift_JIS B-word
    val sjis = java.util.Base64.getEncoder.encodeToString("日本".getBytes("Shift_JIS"))
    assert(Mail.decodeWords(s"=?shift_jis?B?$sjis?=") == "日本")
    // unknown labels keep the Latin-1 total fallback, never a throw
    assert(Mail.decodeWords("=?x-no-such-cs?Q?ab?=") == "ab")
  }

  test("quoted-printable: escapes, soft breaks, malformed passthrough") {
    def qp(s: String) = new String(Mail.qpDecode(s.getBytes("ISO-8859-1")).get, "UTF-8")
    assert(qp("a=3Db") == "a=b")
    assert(qp("long=\r\nline") == "longline")
    assert(qp("long=\nline") == "longline")
    assert(qp("bad=Zq") == "bad=Zq")
    assert(qp("ends with=") == "ends with=")
  }

  test("message walk: plain, QP, base64, multipart decoy order, html fallback") {
    val body = "Body 1.0 one\nsecond = 7 end"
    for (kind <- 0 to 4) {
      val raw = Mail.syntheticMessage("a@x", "b@x c@x", "s", body, kind,
        subjEnc = 0, foldTo = kind == 1)
      val (h, parts, text) = Mail.parseMessage(raw).get
      assert(h("from") == "a@x")
      if (kind == 1) assert(h("to") == "b@x c@x", "folded To unfolds byte-for-byte")
      if (kind == 3) {
        assert(parts.map(_.mediaType) == Seq("text/html", "text/plain"),
          "decoy order preserved in the part list")
        assert(text == body, "text/plain wins over the earlier html part")
      } else if (kind == 4) {
        assert(text == body.replace('\n', ' '), "html fallback collapses lines")
      } else assert(text == body, s"kind=$kind")
    }
  }

  test("mbox framing: envelope split, mboxrd unescape, bare message") {
    val m1 = Mail.syntheticMessage("a@x", "b@x", "s1",
      "From the start\nplain", 0, 0, foldTo = false)
    val m2 = Mail.syntheticMessage("c@x", "d@x", "s2", "two", 0, 0, foldTo = false)
    val msgs = Mail.parseMbox(Mail.syntheticMbox(Seq(m1, m2)))
    assert(msgs.length == 2)
    val (_, _, text1) = Mail.parseMessage(msgs.head).get
    assert(text1 == "From the start\nplain", "mboxrd >From unescaped")
    // a bare message with no envelope line still parses
    assert(Mail.parseMbox(m2.getBytes("UTF-8")).length == 1)
  }

  test("fixture sweep matches the oracle's closed forms") {
    for (id <- 0L until 100L) {
      val msgs = (0 until (1 + id % 3).toInt).map { i =>
        Mail.syntheticMessage(s"u$id$i@ex.org",
          s"team${(id + i) % 9}@ex.org list$i@ex.org",
          s"Re: topic $id ${(id * 3 + i) % 31}",
          s"Body $id.$i one\nsecond = ${(id * 7 + i) % 43} end",
          ((id + i) % 5).toInt, ((id + i) % 3).toInt, (id + i) % 4 == 0)
      }
      val got = Mail.parseMbox(Mail.syntheticMbox(msgs)).map(Mail.parseMessage(_).get)
      assert(got.length == msgs.length, s"message count at id=$id")
      got.zipWithIndex.foreach { case ((h, parts, text), i) =>
        assert(Mail.decodeWords(h("subject")) == s"Re: topic $id ${(id * 3 + i) % 31}",
          s"subject at id=$id i=$i enc=${(id + i) % 3}")
        assert(Mail.decodeWords(h("to")) == s"team${(id + i) % 9}@ex.org list$i@ex.org",
          s"to at id=$id i=$i")
        val kind = (id + i) % 5
        val exp = s"Body $id.$i one\nsecond = ${(id * 7 + i) % 43} end"
        assert(text == (if (kind == 4) exp.replace('\n', ' ') else exp),
          s"text at id=$id i=$i kind=$kind")
        assert(parts.length == (if (kind == 3) 2 else 1), s"parts at id=$id i=$i")
      }
    }
  }

  test("corrupt input: never a throw") {
    assert(Mail.parseMbox(null) == Nil)
    assert(Mail.parseMbox(Array.emptyByteArray) == Nil)
    assert(Mail.parseMessage("no colon line\nstill none") == None)
    assert(Mail.parseMessage("A: headers never end") == None)
    // boundary declared but never appears: zero parts, empty text
    val raw = "Content-Type: multipart/mixed; boundary=xyz\n\nno delimiters here"
    val (_, parts, text) = Mail.parseMessage(raw).get
    assert(parts.isEmpty && text == "")
    val good = Mail.syntheticMessage("a@x", "b@x", "s", "t", 3, 1, foldTo = false)
    for (cut <- Seq(5, good.length / 2, good.length - 3))
      Mail.parseMessage(good.substring(0, cut)) // must not throw
  }
}
