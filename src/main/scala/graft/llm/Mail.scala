package graft.llm

import org.apache.spark.sql.Dataset

import graft.llm.Multimodal.Media

/** Email ingestion (round 13): mailing-list archives and mail corpora
  * ship as mbox files of RFC 5322 messages with MIME bodies — the
  * prose is behind THREE encoding layers (header folding + encoded-
  * words, multipart framing, content-transfer-encoding), all of them
  * structural: boundaries are declared in Content-Type, QP and base64
  * are byte-level codes with published grammars (RFC 2045), and
  * encoded-words carry their own charset/encoding tags (RFC 2047). A
  * mistake degrades to a missing part or raw-encoded text, never a
  * silently wrong value — and the oracle replays the DECODED strings,
  * so even that shows up red.
  *
  * Scope, documented: any JVM-resolvable charset label (round 15 —
  * Shift_JIS / KOI8-R / GB* / ISO-2022-JP are all common in real
  * mail; unknown labels fall back to Latin-1 byte mapping, which is
  * total); text extraction prefers the first
  * text/plain part, falling back to [[Warc.htmlText]] over the first
  * text/html part; nested multiparts recurse with a depth bound;
  * mboxrd ">From " unescaping applies to body lines.
  *
  * Reference scope: kafi has no mail surface; LLM-pipeline extension
  * breadth, sibling to [[Warc]]/[[Pdf]]/[[Docs]].
  */
object Mail {

  /** One message: header identity fields (encoded-words decoded,
    * folding unfolded), MIME shape (`n_parts` counts LEAF parts), and
    * the extracted text. */
  case class MailMessage(doc_id: Long, msg_idx: Int, from: String, to: String,
      subject: String, n_parts: Int, text: String)

  // ------------------------------------------------------------------
  // Header layer: unfolding + RFC 2047 encoded-words
  // ------------------------------------------------------------------

  /** Parse `[from, end)` header block: folded continuation lines
    * (leading SP/HT) join with one space; names lower-case; returns
    * (headers, bodyStart) or None if the blank line never comes. */
  private[graft] def parseHeaders(s: String, from: Int): Option[(Map[String, String], Int)] = {
    val m = Map.newBuilder[String, String]
    var i = from
    var curName: String = null
    val curVal = new java.lang.StringBuilder
    def flush(): Unit = {
      if (curName != null) m += (curName -> curVal.toString.trim)
      curName = null; curVal.setLength(0)
    }
    while (i < s.length) {
      val eol0 = s.indexOf('\n', i)
      val eol = if (eol0 < 0) s.length else eol0
      val line = s.substring(i, if (eol > i && s.charAt(eol - 1) == '\r') eol - 1 else eol)
      if (line.isEmpty) { flush(); return Some((m.result(), eol + 1)) }
      if ((line.charAt(0) == ' ' || line.charAt(0) == '\t') && curName != null) {
        curVal.append(' ').append(line.trim) // unfold
      } else {
        val colon = line.indexOf(':')
        if (colon <= 0) return None
        flush()
        curName = line.substring(0, colon).trim.toLowerCase
        curVal.append(line.substring(colon + 1))
      }
      i = eol + 1
    }
    None // headers never closed
  }

  private val ReEncWord = java.util.regex.Pattern.compile(
    "=\\?([^?]+)\\?([bBqQ])\\?([^?]*)\\?=")

  private def charsetOf(name: String): java.nio.charset.Charset = {
    val n = name.trim.toLowerCase
    if (n == "utf-8" || n == "utf8") java.nio.charset.StandardCharsets.UTF_8
    else if (n == "us-ascii" || n == "ascii") java.nio.charset.StandardCharsets.US_ASCII
    else if (n == "iso-8859-1" || n == "latin1") java.nio.charset.StandardCharsets.ISO_8859_1
    else
      // round 15: the full JVM charset table (Shift_JIS, KOI8-R, GB*,
      // ISO-2022-JP — all common in real mail). MIME labels its
      // charsets honestly, so unlike the web path (Warc.charsetFor)
      // there is NO latin-1→cp1252 upgrade here; unknown labels keep
      // the Latin-1 total fallback (every byte maps, never a throw).
      try java.nio.charset.Charset.forName(name.trim)
      catch { case scala.util.control.NonFatal(_) =>
        java.nio.charset.StandardCharsets.ISO_8859_1 }
  }

  /** RFC 2047 encoded-words in a header value: B (base64) and Q
    * (QP variant: `_` is SPACE) forms; adjacent encoded-words join
    * without the intervening whitespace (the RFC 2047 §6.2 rule);
    * undecodable words stay verbatim (fail-open, never a throw). */
  private[graft] def decodeWords(v: String): String = {
    val m = ReEncWord.matcher(v)
    if (!m.find()) return v
    val sb = new java.lang.StringBuilder
    var pos = 0
    var prevWasWord = false
    do {
      val between = v.substring(pos, m.start())
      // whitespace BETWEEN two encoded-words is transparent (§6.2)
      if (!(prevWasWord && between.nonEmpty && between.forall(c => c == ' ' || c == '\t')))
        sb.append(between)
      val cs = charsetOf(m.group(1))
      val decoded: Option[String] = m.group(2).toLowerCase match {
        case "b" =>
          // STRICT decoder: an encoded-word payload contains no
          // whitespace, and the MIME decoder's ignore-junk behavior
          // would turn garbage into "" instead of staying verbatim
          try Some(new String(java.util.Base64.getDecoder.decode(m.group(3)), cs))
          catch { case _: IllegalArgumentException => None }
        case _ =>
          val q = m.group(3).replace('_', ' ')
          qpDecode(q.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1), header = true)
            .map(new String(_, cs))
      }
      sb.append(decoded.getOrElse(m.group()))
      pos = m.end()
      prevWasWord = true
    } while (m.find())
    sb.append(v.substring(pos))
    sb.toString
  }

  // ------------------------------------------------------------------
  // Transfer-encoding layer
  // ------------------------------------------------------------------

  /** Quoted-printable per RFC 2045 §6.7: =XX hex, soft line breaks
    * =\r\n and =\n vanish; malformed escapes pass through verbatim
    * (fail-open). `header` mode is the RFC 2047 Q variant (no soft
    * breaks expected; same =XX grammar). */
  private[graft] def qpDecode(b: Array[Byte], header: Boolean = false): Option[Array[Byte]] = {
    try {
      val out = new java.io.ByteArrayOutputStream(b.length)
      var i = 0
      def hex(c: Int): Int =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else -1
      while (i < b.length) {
        val c = b(i) & 0xFF
        if (c == '=' && i + 1 < b.length) {
          val n1 = b(i + 1) & 0xFF
          if (!header && n1 == '\n') i += 2
          else if (!header && n1 == '\r' && i + 2 < b.length && b(i + 2) == '\n') i += 3
          else if (i + 2 < b.length && hex(n1) >= 0 && hex(b(i + 2) & 0xFF) >= 0) {
            out.write((hex(n1) << 4) | hex(b(i + 2) & 0xFF)); i += 3
          } else { out.write(c); i += 1 } // malformed: verbatim
        } else { out.write(c); i += 1 }
      }
      Some(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def transferDecode(body: String, encoding: String,
      cs: java.nio.charset.Charset): Option[String] =
    encoding.trim.toLowerCase match {
      case "" | "7bit" | "8bit" | "binary" =>
        Some(new String(body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1), cs))
      case "quoted-printable" =>
        qpDecode(body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
          .map(new String(_, cs))
      case "base64" =>
        try Some(new String(java.util.Base64.getMimeDecoder.decode(body), cs))
        catch { case _: IllegalArgumentException => None }
      case _ => None // unknown encoding: part skipped, never garbage
    }

  // ------------------------------------------------------------------
  // MIME part tree
  // ------------------------------------------------------------------

  private[graft] case class Part(mediaType: String, text: Option[String])

  private def param(headerVal: String, name: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile(s"""(?i)[;\\s]$name\\s*=\\s*(?:"([^"]*)"|([^;\\s]+))""")
      .matcher(headerVal)
    if (m.find()) Some(if (m.group(1) != null) m.group(1) else m.group(2)) else None
  }

  /** Leaf parts of a message/part body, depth-bounded recursion over
    * multipart boundaries (RFC 2046 §5.1: parts delimited by
    * `--boundary` lines, terminated by `--boundary--`; preamble and
    * epilogue dropped). */
  private[graft] def leafParts(headers: Map[String, String], body: String,
      depth: Int): Seq[Part] = {
    if (depth > 8) return Nil
    val ctype = headers.getOrElse("content-type", "text/plain")
    val mediaType = ctype.split(";")(0).trim.toLowerCase
    if (mediaType.startsWith("multipart/")) {
      param(ctype, "boundary") match {
        case Some(b) =>
          val delim = "--" + b
          val lines = body.split("\n", -1)
          val sections = Seq.newBuilder[String]
          var cur: java.lang.StringBuilder = null
          var done = false
          lines.foreach { l0 =>
            val l = if (l0.endsWith("\r")) l0.substring(0, l0.length - 1) else l0
            if (!done && l == delim) {
              if (cur != null) sections += cur.toString
              cur = new java.lang.StringBuilder
            } else if (!done && l == delim + "--") {
              if (cur != null) sections += cur.toString
              cur = null; done = true
            } else if (cur != null) {
              if (cur.length > 0) cur.append('\n')
              cur.append(l)
            } // else: preamble/epilogue dropped
          }
          sections.result().flatMap { sec =>
            parseHeaders(sec + "\n", 0) match {
              case Some((h, bs)) => leafParts(h, sec.substring(math.min(bs, sec.length)), depth + 1)
              case None => leafParts(Map.empty, sec, depth + 1) // headerless part: defaults
            }
          }
        case None => Seq(Part(mediaType, None)) // multipart without boundary: opaque
      }
    } else {
      val cs = charsetOf(param(ctype, "charset").getOrElse("us-ascii"))
      val enc = headers.getOrElse("content-transfer-encoding", "")
      val text =
        if (mediaType.startsWith("text/")) transferDecode(body, enc, cs)
        else None
      Seq(Part(mediaType, text))
    }
  }

  /** One RFC 5322 message → header fields + extracted text: the first
    * text/plain leaf, else [[Warc.htmlText]] of the first text/html
    * leaf, else empty. Trailing whitespace trimmed (mbox framing adds
    * a final newline). */
  private[graft] def parseMessage(raw0: String): Option[(Map[String, String], Seq[Part], String)] = {
    val raw = raw0.replace("\r\n", "\n") // one EOL form downstream
    parseHeaders(raw, 0).map { case (headers, bodyStart) =>
      val parts = leafParts(headers, raw.substring(math.min(bodyStart, raw.length)), 0)
      val text = parts.collectFirst { case Part(t, Some(x)) if t == "text/plain" => x }
        .orElse(parts.collectFirst { case Part(t, Some(x)) if t == "text/html" => Warc.htmlText(x) })
        .getOrElse("")
      (headers, parts, text.reverse.dropWhile(c => c == '\n' || c == '\r' || c == ' ').reverse)
    }
  }

  // ------------------------------------------------------------------
  // mbox framing
  // ------------------------------------------------------------------

  /** Split an mbox into messages: a message starts at a line beginning
    * `From ` (the envelope line, dropped); body lines beginning
    * `>From ` are mboxrd escapes and lose one `>`. Accepts a bare
    * single message (no envelope) too. */
  private[graft] def parseMbox(raw: Array[Byte]): Seq[String] = {
    if (raw == null || raw.length == 0) return Nil
    try {
      val s = new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
      val lines = s.split("\n", -1)
      val msgs = Seq.newBuilder[String]
      var cur: java.lang.StringBuilder = null
      lines.foreach { line =>
        if (line.startsWith("From ")) {
          if (cur != null) msgs += cur.toString
          cur = new java.lang.StringBuilder
        } else {
          if (cur == null) cur = new java.lang.StringBuilder // bare message
          val l = if (line.startsWith(">From ")) line.substring(1) else line
          if (cur.length > 0) cur.append('\n')
          cur.append(l)
        }
      }
      if (cur != null) msgs += cur.toString
      msgs.result().filter(_.nonEmpty)
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** mbox blobs → messages, a pure flatMap kernel. */
  def readMbox(ds: Dataset[Media]): Dataset[MailMessage] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { m =>
      parseMbox(m.media).zipWithIndex.flatMap { case (raw, i) =>
        parseMessage(raw).map { case (h, parts, text) =>
          MailMessage(m.doc_id, i,
            decodeWords(h.getOrElse("from", "")),
            decodeWords(h.getOrElse("to", "")),
            decodeWords(h.getOrElse("subject", "")),
            parts.length, text)
        }
      }
    })
  }

  // ------------------------------------------------------------------
  // Fixture writer
  // ------------------------------------------------------------------

  private def qpEncode(s: String): String = {
    // token-at-a-time so a soft wrap can never split an =XX escape
    val out = new java.lang.StringBuilder
    var col = 0
    def emit(tok: String): Unit = {
      if (col + tok.length > 72) { out.append("=\r\n"); col = 0 }
      out.append(tok); col += tok.length
    }
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val c = b & 0xFF
      if (c == '\n') { out.append("\r\n"); col = 0 }
      else if (c == '=' || c > 126 || c < 32) emit(f"=${c}%02X")
      else emit(c.toChar.toString)
    }
    out.toString
  }

  /** One message block (no envelope line). `bodyKind`: 0 plain-7bit,
    * 1 plain-QP (UTF-8 content), 2 plain-base64, 3 multipart with an
    * html decoy FIRST and the plain part second (text/plain must win
    * regardless of order), 4 html-only (htmlText fallback). Subject
    * encoding: 0 raw, 1 B-word, 2 Q-word (split across two adjacent
    * words whose separating space must vanish). `foldTo` folds the To
    * header across a continuation line. */
  def syntheticMessage(from: String, to: String, subject: String,
      bodyText: String, bodyKind: Int, subjEnc: Int, foldTo: Boolean): String = {
    val sb = new java.lang.StringBuilder
    sb.append(s"From: $from\r\n")
    if (foldTo && to.contains(' ')) {
      // fold at an existing whitespace point (RFC 5322 §2.2.3) so
      // unfolding restores the value byte-for-byte
      val sp = to.indexOf(' ')
      sb.append(s"To: ${to.substring(0, sp)}\r\n\t${to.substring(sp + 1)}\r\n")
    } else sb.append(s"To: $to\r\n")
    val subj = subjEnc match {
      case 1 =>
        "=?utf-8?B?" + java.util.Base64.getEncoder.encodeToString(
          subject.getBytes(java.nio.charset.StandardCharsets.UTF_8)) + "?="
      case 2 =>
        val cut = math.max(1, subject.length / 2)
        def q(x: String) = "=?utf-8?Q?" + x.replace("=", "=3D").replace(" ", "_")
          .replace("?", "=3F") + "?="
        q(subject.substring(0, cut)) + " " + q(subject.substring(cut))
      case _ => subject
    }
    sb.append(s"Subject: $subj\r\n")
    sb.append("Date: Thu, 1 Jan 2026 00:00:00 +0000\r\n")
    bodyKind match {
      case 1 =>
        sb.append("Content-Type: text/plain; charset=\"utf-8\"\r\n")
        sb.append("Content-Transfer-Encoding: quoted-printable\r\n\r\n")
        sb.append(qpEncode(bodyText)).append("\r\n")
      case 2 =>
        sb.append("Content-Type: text/plain; charset=utf-8\r\n")
        sb.append("Content-Transfer-Encoding: base64\r\n\r\n")
        sb.append(java.util.Base64.getMimeEncoder.encodeToString(
          bodyText.getBytes(java.nio.charset.StandardCharsets.UTF_8))).append("\r\n")
      case 3 =>
        val b = "bnd42"
        sb.append(s"Content-Type: multipart/alternative; boundary=$b\r\nMIME-Version: 1.0\r\n\r\n")
        sb.append("preamble is dropped\r\n")
        sb.append(s"--$b\r\nContent-Type: text/html; charset=us-ascii\r\n\r\n")
        sb.append(s"<html><body><p>html decoy</p></body></html>\r\n")
        sb.append(s"--$b\r\nContent-Type: text/plain; charset=utf-8\r\n")
        sb.append("Content-Transfer-Encoding: quoted-printable\r\n\r\n")
        sb.append(qpEncode(bodyText)).append("\r\n")
        sb.append(s"--$b--\r\nepilogue dropped\r\n")
      case 4 =>
        sb.append("Content-Type: text/html; charset=us-ascii\r\n\r\n")
        sb.append(s"<html><body><p>$bodyText</p></body></html>\r\n")
      case _ =>
        sb.append("Content-Type: text/plain; charset=us-ascii\r\n\r\n")
        sb.append(bodyText).append("\r\n")
    }
    sb.toString
  }

  /** An mbox of `msgs` message blocks with envelope lines; body lines
    * starting `From ` get the mboxrd `>` escape. */
  def syntheticMbox(msgs: Seq[String]): Array[Byte] = {
    val sb = new java.lang.StringBuilder
    msgs.foreach { m =>
      sb.append("From sender@example.org Thu Jan  1 00:00:00 2026\n")
      m.split("\n", -1).foreach { l =>
        val stripped = if (l.endsWith("\r")) l.substring(0, l.length - 1) else l
        if (stripped.startsWith("From ")) sb.append('>')
        sb.append(stripped).append('\n')
      }
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
