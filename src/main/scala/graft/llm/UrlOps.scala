package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the normalization pass
  * CCNet/FineWeb-class pipelines run before URL-level dedup, domain
  * frequency caps, and blocklist joins (a crawl sees the same page as
  * `HTTP://WWW.Site.COM:80/a/?utm_source=x` and `http://site.com/a`;
  * without canonical forms, URL dedup undercounts and domain caps leak).
  *
  * Rules (the standard safe subset — semantics-preserving per RFC 3986
  * §6, plus the tracking-param scrub every production pipeline adds):
  *  1. scheme and host lowercase; a leading `www.` strips;
  *  2. default ports drop (http:80, https:443); explicit others keep;
  *  3. the fragment drops (never sent to the server);
  *  4. tracking params drop (`utm_*`, `fbclid`, `gclid`, `ref`), the rest
  *     SORT lexicographically and rejoin — param order is almost always
  *     semantics-free and sorting makes equivalent URLs collide;
  *  5. one trailing slash strips from the path (path CASE is preserved —
  *     paths are case-sensitive, hosts are not).
  *
  * Everything is Column algebra over one anchored regex split — codegen'd
  * map stage, no UDF, no shuffle; at 100 TB this rides the scan like the
  * other text metrics. A non-URL (no `scheme://`) canonicalizes to NULL so
  * downstream dedup keys never mix malformed rows with real ones.
  *
  * `registeredDomain` is the PSL-free approximation (last two host
  * labels): right for .com/.org/.io, one label short for ccSLDs like
  * .co.uk — documented; swapping in a public-suffix-list lookup changes
  * no plan shape. */
object UrlOps {

  private val UrlRe = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\\??([^#]*)#?.*$"
  // (?i): tracking params appear uppercased in the wild (UTM_SOURCE=…) and
  // a case-sensitive scrub would let them survive into "canonical" forms
  private val TrackingRe = "(?i)^(utm_[^=&]*|fbclid|gclid|ref)(=|$)"

  /** Scheme-lowercased, www-stripped, default-port-free, fragment-free,
    * tracking-scrubbed, param-sorted canonical form (NULL for non-URLs). */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, UrlRe, 1))
    val auth = regexp_extract(url, UrlRe, 2)
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val host = regexp_replace(lower(regexp_replace(auth, ":[0-9]+$", "")), "^www\\.", "")
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_replace(regexp_extract(url, UrlRe, 3), "/$", "")
    val kept = sort_array(filter(split(regexp_extract(url, UrlRe, 4), "&"),
      p => p =!= lit("") && !p.rlike(TrackingRe)))
    val queryPart = when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
      .otherwise(lit(""))
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, queryPart))
  }

  /** LEGACY (round 14): last two labels of the canonical host. Under a
    * ccTLD registry suffix this collapses every `.co.uk` site to the
    * single pseudo-domain `co.uk` — at corpus scale one hot bucket
    * absorbs a country's whole cap budget. Domain caps and blocklist
    * joins key on [[registeredDomainCc]]; this form is kept only as
    * the documented baseline the Cc variant is defined against (no
    * query keys on it since round 14). NULL when the input is not a
    * URL. */
  def registeredDomain(url: Column): Column = {
    val auth = regexp_extract(url, UrlRe, 2)
    val host = regexp_replace(lower(regexp_replace(auth, ":[0-9]+$", "")), "^www\\.", "")
    val dom = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    when(regexp_extract(url, UrlRe, 1) === "" || dom === "", lit(null).cast("string"))
      .otherwise(dom)
  }

  /** The country-code second-level labels under which registrations
    * actually happen (`foo.co.uk`, not `co.uk`). The common public-
    * suffix convention without shipping the full PSL — the labels
    * every major ccTLD registry uses. */
  private val ccSecondLevels =
    Seq("co", "com", "org", "net", "gov", "edu", "ac", "or", "ne", "go", "mil")

  /** ccSLD-aware registered domain (round 13): closes the documented
    * [[registeredDomain]] gap — under a two-letter ccTLD whose second
    * label is a registry category (`co.uk`, `com.au`, `ac.jp`, …) the
    * registration lives at the THIRD label, so `a.b.foo.co.uk` keys as
    * `foo.co.uk` while `a.b.foo.com` still keys as `foo.com`. Pure
    * Column algebra (codegen'd, no UDF); NULL for non-URLs; a bare
    * registry suffix (`co.uk` itself) keys as itself. */
  def registeredDomainCc(url: Column): Column = {
    val auth = regexp_extract(url, UrlRe, 2)
    val host = regexp_replace(lower(regexp_replace(auth, ":[0-9]+$", "")), "^www\\.", "")
    val parts = split(host, "\\.")
    val n = size(parts)
    val last = element_at(parts, -1)
    val second = when(n >= 2, element_at(parts, -2)).otherwise(lit(""))
    val ccRule = last.rlike("^[a-z][a-z]$") &&
      second.isin(ccSecondLevels.map(x => x: Any): _*)
    val dom = when(n >= 3 && ccRule,
        concat_ws(".", element_at(parts, -3), second, last))
      .when(n >= 2, concat_ws(".", second, last))
      .otherwise(lit(""))
    when(regexp_extract(url, UrlRe, 1) === "" || dom === "", lit(null).cast("string"))
      .otherwise(dom)
  }
}
