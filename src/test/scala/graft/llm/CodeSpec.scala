package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Code curation (round 13): comment-grammar semantics per family and
  * license fingerprints. */
class CodeSpec extends AnyFunSuite {

  private def c(s: String) = Code.stripComments(s, "c")
  private def py(s: String) = Code.stripComments(s, "hash")
  private def sql(s: String) = Code.stripComments(s, "sql")

  test("c family: strings opaque, block = one space, escapes") {
    assert(c("int a; // gone\nint b;") == "int a; \nint b;")
    assert(c("a /* x */ b") == "a   b")
    assert(c("s = \"// not a comment\";") == "s = \"// not a comment\";")
    assert(c("s = \"a\\\"b // still\";") == "s = \"a\\\"b // still\";")
    assert(c("ch = '/'; // c\n") == "ch = '/'; \n")
    assert(c("/* \" quote inside comment */ x") == "  x")
    assert(c("a /* unterminated") == "a  ")
    assert(c("url = \"http://x\";") == "url = \"http://x\";") // :// is in a string
    assert(c("# not special in c\n") == "# not special in c\n")
  }

  test("hash family: trailing comments, docstrings, quotes") {
    assert(py("x = 1  # gone\ny = 2") == "x = 1  \ny = 2")
    assert(py("s = \"a # b\"") == "s = \"a # b\"")
    assert(py("s = 'a # b'") == "s = 'a # b'")
    assert(py("d = \"\"\"x # y\nz\"\"\"\nw = 1") == "d = \"\"\"x # y\nz\"\"\"\nw = 1")
    assert(py("// not special\n# gone") == "// not special\n")
    assert(py("s = \"unterminated\nx = 1 # gone") == "s = \"unterminated\nx = 1 ")
  }

  test("sql family: doubled-quote escapes, both comment forms") {
    assert(sql("SELECT 1 -- c\nFROM t") == "SELECT 1 \nFROM t")
    assert(sql("SELECT '--not' AS s") == "SELECT '--not' AS s")
    assert(sql("SELECT 'it''s -- still' /* b */, 2") == "SELECT 'it''s -- still'  , 2")
    assert(sql("SELECT \"ident\" -- x\n") == "SELECT \"ident\" \n") // " not a string in this scope
  }

  test("license fingerprints") {
    assert(Code.licenseOf("// SPDX-License-Identifier: MIT\nx") == "MIT")
    assert(Code.licenseOf("# SPDX-License-Identifier: GPL-3.0-or-later") == "GPL-3.0-or-later")
    assert(Code.licenseOf("Permission is hereby granted, free of charge, ...") == "MIT")
    assert(Code.licenseOf("Licensed under the Apache License, Version 2.0") == "Apache-2.0")
    assert(Code.licenseOf("GNU General Public License as published..., version 3") == "GPL-3.0")
    assert(Code.licenseOf("GNU General Public License version 2") == "GPL-2.0")
    assert(Code.licenseOf("Redistribution and use in source and binary forms") == "BSD-3-Clause")
    assert(Code.licenseOf("Mozilla Public License 2.0") == "MPL-2.0")
    assert(Code.licenseOf("This is free and unencumbered software released into the public domain")
      == "Unlicense")
    assert(Code.licenseOf("just code") == "unknown")
    assert(Code.licenseOf(null) == "unknown")
  }

  test("never a throw: hostile input") {
    assert(Code.stripComments(null, "c") == "")
    val rng = new scala.util.Random(3)
    for (fam <- Seq("c", "hash", "sql"); _ <- 0 until 100) {
      val s = (0 until 60).map(_ => "/*-#'\"\\\n ab".charAt(rng.nextInt(10))).mkString
      Code.stripComments(s, fam) // must not throw
    }
  }
}
