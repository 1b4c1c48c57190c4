package graft.llm

import org.apache.spark.sql.Dataset

import graft.llm.Multimodal.Media

/** Code-corpus curation (round 13): source files are a training-data
  * pillar of their own, and the two operators every code pipeline
  * runs before anything else are license identification (keep only
  * permissive) and comment stripping (dedup on code, not on comment
  * churn). Both are structural text walks — and both have the same
  * classic failure mode, which the fixtures pin: comment markers
  * INSIDE string literals are code, string quotes INSIDE comments are
  * comment.
  *
  * Comment grammars by family, a documented subset:
  *  - `c` (C/C++/Java/JS/Go/Rust/Scala…): `//` to EOL, non-nesting
  *    `/*…*/` replaced by one space (the C-preprocessor rule), string
  *    and char literals with backslash escapes opaque to both;
  *  - `hash` (Python/Ruby/shell/YAML…): `#` to EOL; single/double
  *    quotes with escapes, and Python triple-quotes treated as
  *    strings (a `#` inside a docstring is text);
  *  - `sql`: `--` to EOL plus the block form; single-quoted strings
  *    with doubled-quote escaping.
  *
  * License identification: SPDX-License-Identifier tags win when
  * present (the modern convention); otherwise phrase fingerprints of
  * the six licenses that dominate public code. Unknown is a normal
  * outcome, not an error.
  *
  * Reference scope: kafi has no code surface; LLM-pipeline extension
  * breadth, sibling to [[Notebooks]].
  */
object Code {

  /** Strip comments per family; non-comment bytes pass through
    * byte-exact (newlines of line comments kept — line structure is
    * load-bearing for downstream diff/dedup). Total function. */
  private[graft] def stripComments(src: String, family: String): String = {
    if (src == null) return ""
    val n = src.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    val lineMarker = family match {
      case "sql" => "--"
      case "hash" => "#"
      case _ => "//"
    }
    val hasBlock = family == "c" || family == "sql"
    val quotes = if (family == "sql") "'" else "\"'"
    while (i < n) {
      val c = src.charAt(i)
      if (quotes.indexOf(c) >= 0) {
        // string literal: copy opaquely to its closing quote
        val q = c
        val triple = family == "hash" && i + 2 < n &&
          src.charAt(i + 1) == q && src.charAt(i + 2) == q
        if (triple) {
          out.append(src, i, i + 3)
          i += 3
          val end = src.indexOf(s"$q$q$q", i)
          if (end < 0) { out.append(src, i, n); i = n }
          else { out.append(src, i, end + 3); i = end + 3 }
        } else {
          out.append(q); i += 1
          var closed = false
          while (!closed && i < n) {
            val d = src.charAt(i)
            if (family == "sql" && d == '\'' && i + 1 < n && src.charAt(i + 1) == '\'') {
              out.append("''"); i += 2 // SQL doubled-quote escape
            } else if (family != "sql" && d == '\\' && i + 1 < n) {
              out.append(src, i, i + 2); i += 2
            } else {
              out.append(d); i += 1
              if (d == q || d == '\n') closed = true // unterminated: stop at EOL
            }
          }
        }
      } else if (src.startsWith(lineMarker, i)) {
        while (i < n && src.charAt(i) != '\n') i += 1 // keep the newline itself
      } else if (hasBlock && c == '/' && i + 1 < n && src.charAt(i + 1) == '*') {
        val end = src.indexOf("*/", i + 2)
        out.append(' ') // the C rule: a block comment reads as one space
        i = if (end < 0) n else end + 2
      } else {
        out.append(c); i += 1
      }
    }
    out.toString
  }

  private val SpdxRe = java.util.regex.Pattern.compile(
    """SPDX-License-Identifier:\s*([A-Za-z0-9.+-]+)""")

  /** License of a source head: SPDX tag verbatim, else phrase
    * fingerprints, else "unknown". */
  private[graft] def licenseOf(src: String): String = {
    if (src == null) return "unknown"
    val head = src.substring(0, math.min(src.length, 4000))
    val m = SpdxRe.matcher(head)
    if (m.find()) return m.group(1)
    val h = head.toLowerCase
    if (h.contains("permission is hereby granted, free of charge") ||
      h.contains("mit license")) "MIT"
    else if (h.contains("apache license") && h.contains("version 2.0")) "Apache-2.0"
    else if (h.contains("gnu general public license") || h.contains("gnu gpl")) {
      if (h.contains("version 3")) "GPL-3.0" else "GPL-2.0"
    } else if (h.contains("redistribution and use in source and binary forms")) "BSD-3-Clause"
    else if (h.contains("mozilla public license")) "MPL-2.0"
    else if (h.contains("the unlicense") || h.contains("this is free and unencumbered software"))
      "Unlicense"
    else "unknown"
  }

  /** (blob, family) feed → (doc_id, family, stripped code) — the
    * dedup-input form; a pure map kernel. */
  def strippedCode(ds: Dataset[Media], familyOf: String => String): Dataset[(Long, String, String)] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { m =>
      val fam = familyOf(m.mime)
      (m.doc_id, fam, stripComments(new String(m.media,
        java.nio.charset.StandardCharsets.UTF_8), fam))
    })
  }

  /** Blob feed → (doc_id, license) — the admission gate. */
  def licenses(ds: Dataset[Media]): Dataset[(Long, String)] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map(m =>
      (m.doc_id, licenseOf(new String(m.media, java.nio.charset.StandardCharsets.UTF_8)))))
  }
}
