package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** robots.txt REP semantics + feed extraction (round 13). */
class CrawlFeedSpec extends AnyFunSuite {

  test("robots parse: groups, comments, case, crawl-delay noise, sitemap") {
    val r = Crawl.parseRobots(
      """# hi
        |User-Agent: BotA
        |user-agent: botb
        |Disallow: /x/  # trailing comment
        |Allow: /x/ok
        |Crawl-delay: 3
        |Disallow: /y$
        |
        |User-agent: *
        |Disallow: /z/
        |Sitemap: https://e/s.xml
        |Disallow: /after-sitemap/
        |""".stripMargin)
    assert(r.groups.length == 2)
    assert(r.groups.head._1 == Seq("bota", "botb"))
    assert(r.groups.head._2 == Seq((false, "/x/"), (true, "/x/ok"), (false, "/y$")))
    assert(r.groups(1)._2 == Seq((false, "/z/"), (false, "/after-sitemap/")))
    assert(r.sitemaps == Seq("https://e/s.xml"))
    // rules before any user-agent line are ignored; junk never throws
    assert(Crawl.parseRobots("Disallow: /early/\nUser-agent: a\nDisallow: /b/")
      .groups == Seq((Seq("a"), Seq((false, "/b/")))))
    assert(Crawl.parseRobots(null).groups.isEmpty)
    assert(Crawl.parseRobots("no colons here\n\n##").groups.isEmpty)
  }

  test("pattern matching: wildcards and the $ anchor") {
    assert(Crawl.patternMatches("/a/", "/a/b"))
    assert(!Crawl.patternMatches("/a/", "/b/a/"))
    assert(Crawl.patternMatches("/*/private", "/x/private-stuff"))
    assert(Crawl.patternMatches("/*.php$", "/dir/x.php"))
    assert(!Crawl.patternMatches("/*.php$", "/dir/x.php?q=1"))
    assert(Crawl.patternMatches("/a*b*c", "/aXXbYYc-and-more"))
    assert(!Crawl.patternMatches("/a*b*c", "/aXXbYY"))
    assert(Crawl.patternMatches("/a*b$", "/abXb"), "anchored final segment matches at the end")
    assert(Crawl.patternMatches("/*$", "/anything"))
  }

  test("REP decision: group selection, longest match, allow ties") {
    val r = Crawl.parseRobots(
      """User-agent: grunt
        |Disallow: /d/
        |Allow: /d/deep/
        |User-agent: *
        |Disallow: /
        |""".stripMargin)
    assert(!Crawl.isAllowed(r, "GruntBot/2", "/d/x"))
    assert(Crawl.isAllowed(r, "GruntBot/2", "/d/deep/x"), "longer allow wins")
    assert(Crawl.isAllowed(r, "GruntBot/2", "/open/"), "star group must not apply")
    assert(!Crawl.isAllowed(r, "SomeOther/1", "/anything"), "star group for strangers")
    // equal length: allow wins
    val r2 = Crawl.parseRobots("User-agent: *\nDisallow: /p/\nAllow: /p/\n")
    assert(Crawl.isAllowed(r2, "x", "/p/q"))
    // no groups at all → allowed
    assert(Crawl.isAllowed(Crawl.parseRobots(""), "x", "/q"))
    // RFC 9309 §2.2.1 (round 14): rules from ALL groups carrying the
    // selected token merge — a split-group robots.txt must not lose
    // the second group's Allow, and the longest-match scan runs over
    // the union
    val r3 = Crawl.parseRobots(
      """User-agent: grunt
        |Disallow: /d/
        |User-agent: other
        |Disallow: /
        |User-agent: grunt
        |Allow: /d/deep/
        |""".stripMargin)
    assert(!Crawl.isAllowed(r3, "GruntBot/2", "/d/x"))
    assert(Crawl.isAllowed(r3, "GruntBot/2", "/d/deep/x"),
      "allow from the SECOND grunt group must merge in")
    // the * fallback likewise merges every * group
    val r4 = Crawl.parseRobots(
      "User-agent: *\nDisallow: /a/\nUser-agent: x\nDisallow: /u/\nUser-agent: *\nAllow: /a/b/\n")
    assert(!Crawl.isAllowed(r4, "Stranger", "/a/z"))
    assert(Crawl.isAllowed(r4, "Stranger", "/a/b/z"),
      "allow from the second * group must merge in")
  }

  test("feeds: rss vs atom, CDATA vs entity-encoded bodies, links") {
    val items = Seq(("T & a", "https://l/1", "<p>one <b>x</b> &amp; y</p>"),
      ("T2", "https://l/2", "<p>two</p>"))
    for (atom <- Seq(false, true); cd <- Seq(true, false)) {
      val got = Feeds.parseFeed(new String(
        Feeds.syntheticFeed(atom, items, _ => cd), "UTF-8"))
      assert(got.length == 2, s"atom=$atom cd=$cd")
      assert(got.head == ((if (atom) "atom" else "rss"), "T & a", "https://l/1",
        "one x & y"), s"atom=$atom cd=$cd")
    }
    // mixed CDATA/encoded in one feed land on identical text shapes
    val mixed = Feeds.parseFeed(new String(
      Feeds.syntheticFeed(atom = false, items, i => i == 0), "UTF-8"))
    assert(mixed.map(_._4) == Seq("one x & y", "two"))
    assert(Feeds.parseFeed("not xml at all") == Nil)
    assert(Feeds.parseFeed(null) == Nil)
  }

  test("surt: hosts, www, ports, params, fragments, degenerate inputs") {
    assert(Crawl.surt("http://www.Example.COM/Foo?b=2&a=1#x") ==
      "com,example)/foo?a=1&b=2")
    assert(Crawl.surt("https://sub.ex.org:443/p") == "org,ex,sub)/p")
    assert(Crawl.surt("http://ex.org:8080/p") == "org,ex:8080)/p")
    assert(Crawl.surt("http://ex.org") == "org,ex)")
    assert(Crawl.surt("http://ex.org/?") == "org,ex)/")
    assert(Crawl.surt("ftp://ex.org/f") == "org,ex)/f") // scheme-agnostic
    assert(Crawl.surt("no scheme HERE") == "no scheme here")
    assert(Crawl.surt(null) == "" && Crawl.surt("") == "")
    // IPv6-ish colon garbage in the host never mis-parses as a port
    assert(Crawl.surt("http://[::1]/p") == "[::1])/p")
  }

  test("cdx: line framing, codec dispatch, short-line skip") {
    val caps = Seq(
      ("http://www.a.org/x", "20260101000000", """{"status":"200"}"""),
      ("http://b.net/y?q=1", "20260102000000", """{"status":"404","length":"5"}"""))
    (0 to 2).foreach { c =>
      val recs = new String(
        Archives.decompressAny(Crawl.syntheticCdx(caps, c)).get, "UTF-8")
      assert(recs.linesIterator.size == 2, s"codec $c")
    }
    val parsed = {
      val bytes = Crawl.syntheticCdx(caps, 1)
      // run the kernel body directly on the decompressed text
      val txt = new String(Archives.decompressAny(bytes).get, "UTF-8")
      txt.linesIterator.toSeq
    }
    assert(parsed.head.startsWith("org,a)/x 20260101000000 {"))
    assert(parsed(1).startsWith("net,b)/y?q=1 20260102000000 {"))
  }

  test("sitemaps r15: gzip layer, the 50,000 cap, changefreq, corrupt refusal") {
    // .xml.gz parses to exactly the plain document's rows
    val urls = Seq(("https://a.org/p?x=1&y=2", "2026-08-01", Some(0.9)),
      ("https://a.org/q", "", None))
    val plain = Crawl.parseSitemap(Crawl.syntheticSitemap(index = false, urls))
    val gz = Crawl.parseSitemap(Crawl.syntheticSitemap(index = false, urls,
      gzipped = true))
    assert(plain.nonEmpty && gz == plain, "gzip is invisible")
    assert(plain.head._3 == "daily", "changefreq carried")
    // sitemapindex rows have empty changefreq and default priority
    val si = Crawl.parseSitemap(Crawl.syntheticSitemap(index = true,
      Seq(("https://a.org/m0.xml.gz", "2026-07-02", None)), gzipped = true))
    assert(si == Seq(("https://a.org/m0.xml.gz", "2026-07-02", "", 0.5, 1)))
    // the protocol's 50,000-entry cap bounds the walk
    val big = Crawl.syntheticSitemap(index = false,
      (0 until 50005).map(i => (s"https://a.org/$i", "", None)))
    assert(Crawl.parseSitemap(big).length == 50000)
    // a <url> with no <loc> contributes nothing; corrupt gzip refuses
    val noLoc = new String(Crawl.syntheticSitemap(index = false, urls), "UTF-8")
      .replaceFirst("<loc>.*?</loc>", "").getBytes("UTF-8")
    assert(Crawl.parseSitemap(noLoc).length == 1)
    assert(Crawl.parseSitemap(Array[Byte](0x1F, 0x8B.toByte, 1, 2, 3)).isEmpty)
  }
}
