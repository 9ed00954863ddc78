package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.UrlOps

/** URL-tier curation goldens: hostile-URL normalization, exact dedup
  * on the normalized form, public-suffix-lite domain registration, and
  * deterministic per-domain caps.
  */
class UrlOpsSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private def norm(urls: (Long, String)*): Map[Long, Option[String]] =
    UrlOps.urlNormalize(urls.toDF("doc_id", "url")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap

  test("urlNormalize: hostile-URL goldens") {
    val got = norm(
      1L -> "HTTP://User:pw@WWW.Example.COM:80/a/b/?b=2&utm_source=x&a=1#frag",
      2L -> "https://example.com:443/",
      3L -> "https://example.com:8443/x",
      4L -> "http://example.com/a//",
      5L -> "http://example.com/a?fbclid=abc&utm_x=1",
      6L -> "  http://example.com/pad  ",
      7L -> "not a url at all",
      8L -> "http://example.com?a=1&a=0",
      9L -> "ftp://Files.Example.org/pub/",
      10L -> "http://h.example.com/a#/view?sid=123",
      11L -> "http://bad.example.com./x",
      12L -> "http://example.com/r?ref=main",
      13L -> "http://u@x@blocked.com/",
      14L -> "http://[::1]:8080/x",
      15L -> "http://u:p@ss@w@example.net/q")
    assert(got(1L) === Some("http://www.example.com/a/b?a=1&b=2"))
    assert(got(2L) === Some("https://example.com"))        // default port + root slash
    assert(got(3L) === Some("https://example.com:8443/x")) // non-default port SURVIVES
    assert(got(4L) === Some("http://example.com/a"))       // all trailing slashes
    assert(got(5L) === Some("http://example.com/a"))       // only tracking params -> no '?'
    assert(got(6L) === Some("http://example.com/pad"))     // outer whitespace
    assert(got(7L) === None)                               // quarantine
    assert(got(8L) === Some("http://example.com?a=0&a=1")) // repeated key sorts by value
    assert(got(9L) === Some("ftp://files.example.org/pub")) // non-http scheme, no port rule
    // a '?' INSIDE the fragment is not a query (SPA-route shape)
    assert(got(10L) === Some("http://h.example.com/a"))
    // FQDN trailing dot canonicalizes away (blocklist-evasion vector)
    assert(got(11L) === Some("http://bad.example.com/x"))
    // bare 'ref' is load-bearing (branch selectors) and SURVIVES
    assert(got(12L) === Some("http://example.com/r?ref=main"))
    // userinfo strips to the LAST '@' (RFC 3986): 'x@blocked.com' must
    // not survive as the host — the blocklist-evasion class
    assert(got(13L) === Some("http://blocked.com"))
    // bracketed IPv6 authority: the determinism tier QUARANTINES
    assert(got(14L) === None)
    // a password containing '@' still strips as userinfo
    assert(got(15L) === Some("http://example.net/q"))
  }

  test("urlNormalize: percent-encoding canonicalization (RFC 3986 §6)") {
    val got = norm(
      // unreserved escapes DECODE (%41->A is case-normalized to host
      // lowercase later; path %7E->~, %63->c); reserved escapes keep
      // but uppercase their hex (%2f -> %2F)
      1L -> "http://example.com/%7Euser/arti%63les/a%2fb",
      2L -> "http://example.com/~user/articles/a%2Fb",
      // '+' in the QUERY spells a space -> %20; '+' in the PATH is literal
      3L -> "http://example.com/a+b?t=x+y",
      4L -> "http://example.com/a+b?t=x%20y",
      // malformed escapes preserve byte-for-byte (no crash, no guess)
      5L -> "http://example.com/100%?p=%zz&q=1",
      6L -> "http://example.com/pct%",
      // an encoded spelling of a tracking key must not evade the kill
      7L -> "http://example.com/x?utm%5Fsource=feed&a=1",
      // %31 is unreserved digit '1'
      8L -> "http://example.com/x?a=%31",
      // a raw U+0002 (the sentinel byte, never legal in a URL) strips
      // IDENTICALLY on the escape-free fast path and the slow path —
      // the two paths must apply one collision convention
      9L -> "http://example.com/a\u0002b",
      10L -> "http://example.com/a\u0002b%41")
    assert(got(1L) === Some("http://example.com/~user/articles/a%2Fb"))
    assert(got(2L) === Some("http://example.com/~user/articles/a%2Fb"))
    assert(got(3L) === Some("http://example.com/a+b?t=x%20y"))
    assert(got(4L) === Some("http://example.com/a+b?t=x%20y"))
    assert(got(5L) === Some("http://example.com/100%?p=%zz&q=1"))
    assert(got(6L) === Some("http://example.com/pct%"))
    assert(got(7L) === Some("http://example.com/x?a=1"))
    assert(got(8L) === Some("http://example.com/x?a=1"))
    assert(got(9L) === Some("http://example.com/ab"))  // fast path strips too
    assert(got(10L) === Some("http://example.com/abA")) // slow path: same convention
  }

  test("urlNormalize: host column rides along; NULL on quarantined rows") {
    val got = UrlOps.urlNormalize(Seq(
      (1L, "HTTP://User@WWW.Example.COM:8080/a"),
      (2L, "junk")).toDF("doc_id", "url")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(got(1L) === Some("www.example.com"))
    assert(got(2L) === None)
  }

  test("urlDedup: variants collapse, first id keeps, invalid rows drop") {
    val urls = Seq(
      (10L, "HTTP://A.com/x/?utm_source=f"),
      (11L, "http://a.com/x"),
      (12L, "http://a.com/x#sec"),
      (13L, "http://a.com/y"),
      (14L, "junk")).toDF("doc_id", "url")
    val got = UrlOps.urlDedup(UrlOps.urlNormalize(urls)).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(got.keySet === Set(10L, 11L, 12L, 13L)) // 14 quarantined
    assert(got(10L) === (("http://a.com/x", true)))
    assert(got(11L)._2 === false && got(12L)._2 === false)
    assert(got(13L) === (("http://a.com/y", true)))
  }

  test("registeredDomain: psl-lite registration") {
    val hosts = Seq("www.example.com", "news.bbc.co.uk", "deep.sub.example.org",
      "src0.pages.github.io", "192.168.10.7", "intranet", "example.com", "co.uk")
    val got = hosts.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "host")
      .select($"host", UrlOps.registeredDomain($"host"))
      .as[(String, String)].collect().toMap
    assert(got("www.example.com") === "example.com")
    assert(got("news.bbc.co.uk") === "bbc.co.uk")
    assert(got("deep.sub.example.org") === "example.org")
    assert(got("src0.pages.github.io") === "pages.github.io")
    assert(got("192.168.10.7") === "192.168.10.7")
    assert(got("intranet") === "intranet")
    assert(got("example.com") === "example.com")
    // a bare multi-suffix has no registrable label: stays itself
    assert(got("co.uk") === "co.uk")
    // FQDN trailing dot must not mint a fresh domain (blocklist evasion)
    val dotted = Seq((0L, "news.bad.co.uk.")).toDF("id", "host")
      .select(UrlOps.registeredDomain($"host")).as[String].collect()(0)
    assert(dotted === "bad.co.uk")
  }

  test("urlNormalize: IDEMPOTENT — normalizing a normalized URL is a no-op (seeded hostile sweep)") {
    // canonical forms must be fixed points: if a second pass changes
    // anything, two crawls of the same frontier disagree on url_norm
    // and the dedup key is unstable
    val rnd = new scala.util.Random(20260816L)
    val schemes = Seq("http", "HTTP", "https", "FTP")
    val userinfos = Seq("", "u:p@", "u@x@")
    val hosts = Seq("Example.COM", "a.b.co.uk", "x.example.org.", "192.168.1.4", "h-1.example.io")
    val ports = Seq("", ":80", ":443", ":8080")
    val paths = Seq("", "/a/b/", "/a%2Fb/", "/%7Euser", "/100%", "/a+b", "/arti%63les", "/%zz/x")
    val queries = Seq("", "?b=2&a=1", "?utm_source=x&a=%31", "?t=x+y&z=a%2fb",
      "?p=%zz", "?sid=1&sid=2", "?a=%41%61&b=%2F", "?+=+")
    val frags = Seq("", "#x", "#/view?q=1")
    def pick[T](xs: Seq[T]) = xs(rnd.nextInt(xs.length))
    val urls = (0 until 500).map(i => (i.toLong,
      s"${pick(schemes)}://${pick(userinfos)}${pick(hosts)}${pick(ports)}" +
        s"${pick(paths)}${pick(queries)}${pick(frags)}"))
    val once = UrlOps.urlNormalize(urls.toDF("doc_id", "url"))
      .filter($"url_norm".isNotNull)
      .select($"doc_id", $"url_norm".as("url"))
    val twice = UrlOps.urlNormalize(once)
    val changed = twice.filter($"url_norm".isNull || $"url_norm" =!= $"url")
    assert(changed.count() === 0L, changed.collect().take(5).mkString("\n"))
  }

  test("idnReport: punycode/unicode exposure per domain; both-forms domain is the live risk") {
    val urls = Seq(
      (1L, "http://xn--bcher-kva.site.example/a"),
      (2L, "http://bücher.site.example/b"),
      (3L, "http://www.site.example/c"),
      (4L, "http://shop.xn--p1ai/d"),
      (5L, "http://clean.other.org/e")).toDF("doc_id", "url")
    val got = UrlOps.idnReport(UrlOps.urlNormalize(urls)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(got("site.example") === ((3L, 1L, 1L, true))) // both forms: live risk
    assert(got("shop.xn--p1ai") === ((1L, 1L, 0L, true)))
    assert(got("other.org") === ((1L, 0L, 0L, false)))
  }

  test("punycode_fold: unicode↔ACE equivalence, idempotence, case fold, codec-reject quarantine") {
    import graft.functions.IdnFold
    // the equivalence the q282 exposure report flags: both spellings
    // of one site fold to ONE key
    assert(IdnFold.fold("bücher.example") === "xn--bcher-kva.example")
    assert(IdnFold.fold("xn--bcher-kva.example") === "xn--bcher-kva.example")
    assert(IdnFold.fold("BÜCHER.example") === "xn--bcher-kva.example")
    assert(IdnFold.fold("münchen.example.de") === IdnFold.fold("xn--mnchen-3ya.example.de"))
    // ASCII hosts are fixed points
    assert(IdnFold.fold("www.example.com") === "www.example.com")
    // quarantine: a host the codec rejects folds to NULL, not a guess
    assert(IdnFold.fold("a..b") === null)
    // idempotence property: fold∘fold ≡ fold over a hostile sweep
    val hosts = Seq("bücher.example", "xn--bcher-kva.example", "WWW.Example.COM",
      "münchen.example.de", "shop.xn--p1ai", "рф", "ПРИМЕР.испытание",
      "intranet", "192.168.1.4", "a-b.c1.example.io")
    hosts.foreach { h =>
      val once = IdnFold.fold(h)
      if (once != null) assert(IdnFold.fold(once) === once, s"not a fixed point: $h")
    }
    // the expression form agrees with the static fold (codegen path)
    val viaExpr = hosts.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("doc_id", "host")
      .select($"host", graft.functions.PunycodeFold($"host").as("f"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    hosts.foreach(h => assert(viaExpr(h) === Option(IdnFold.fold(h)), s"expr vs static: $h"))
  }

  test("idnReportFolded: the q282-flagged both-forms family verifiably merges under the fold") {
    val urls = Seq(
      (1L, "http://xn--bcher-kva.site.example/a"),
      (2L, "http://bücher.site.example/b"),   // same site, unicode spelling
      (3L, "http://www.site.example/c"),
      (4L, "http://shop.xn--p1ai/d"),
      (5L, "http://clean.other.org/e")).toDF("doc_id", "url")
    val got = UrlOps.idnReportFolded(UrlOps.urlNormalize(urls)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    // 3 raw spellings -> 2 folded hosts: exactly one merge, flagged
    assert(got("site.example") === ((3L, 2L, 0L, 1L, true)))
    assert(got("shop.xn--p1ai") === ((1L, 1L, 0L, 0L, false)))
    assert(got("other.org") === ((1L, 1L, 0L, 0L, false)))
  }

  test("urlNormalize extraKill: reviewed keys die with their values; static list still applies") {
    val urls = Seq(
      (1L, "http://a.com/x?sid=42&page=2&utm_source=f"),
      (2L, "http://a.com/x?sid=99&page=2"),
      (3L, "http://a.com/x?sidecar=1")) // exact KEY match only
      .toDF("doc_id", "url")
    val got = UrlOps.urlNormalize(urls, extraKill = Seq("sid")).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) === "http://a.com/x?page=2") // sid + utm both die
    assert(got(2L) === "http://a.com/x?page=2") // now a dup of doc 1
    assert(got(3L) === "http://a.com/x?sidecar=1") // prefix must not match
  }

  test("paramReport: session params convict by value spread + collapse incl. merges into non-carrier URLs") {
    // 4 carrier URLs + 1 NON-carrier on one domain: dropping sid
    // collapses the 4 carriers into 2 forms, ONE of which already
    // exists as the non-carrier URL (n_wo_existing = 1) — the merge
    // class the within-carrier count alone would understate
    val urls = ((0L until 4L).map(i =>
      (i, s"http://a.example.com/p/${i % 2}?page=${i % 2}&sid=$i")) :+
      ((4L, "http://a.example.com/p/0?page=0"))).toDF("doc_id", "url")
    val got = UrlOps.paramReport(UrlOps.urlNormalize(urls)).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getDouble(7)))).toMap
    // sid: 2 dropped-variant forms, 1 merges into the existing URL ->
    // collapse 1 - (2-1)/4 = 0.75
    assert(got("sid") === ((4L, 4L, 4L, 2L, 1L, 0.75)))
    // page is load-bearing: 5 carriers, 5 distinct dropped forms, none
    // pre-existing -> zero collapse
    assert(got("page") === ((5L, 2L, 5L, 5L, 0L, 0.0)))
    val dom = UrlOps.paramReport(UrlOps.urlNormalize(urls)).collect()(0).getString(0)
    assert(dom === "example.com")
  }

  test("registeredDomainPsl: table-driven registration incl. wildcard and exception rules") {
    val hosts = Seq(
      "news.site.com.cn",       // 2-label ccTLD suffix -> site.com.cn
      "portal.agency.gov.au",   // -> agency.gov.au
      "author.blogspot.com",    // private-section entry -> itself +1
      "www.shop.brand.co.za",   // -> brand.co.za
      "a.b.site.ck",            // *.ck: site.ck is public -> b.site.ck
      "www.ck",                 // !www.ck exception -> www.ck registrable
      "foo.www.ck",             // under the exception -> www.ck
      "site.ck",                // IS a public suffix -> itself (lite convention)
      "city.kawasaki.jp",       // !city.kawasaki.jp -> itself (n=ps+1)
      "sub.ward.kawasaki.jp",   // *.kawasaki.jp -> whole host registrable
      "deep.sub.example.com",   // plain com -> example.com
      "unlisted.host.zz",       // no rule -> default ps_len 1 -> host.zz
      "192.168.10.7",           // IPv4 literal -> itself
      "intranet",               // single label -> itself
      "News.Bad.CO.UK.")        // case + FQDN dot normalize first
      .zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val got = UrlOps.registeredDomainPsl(hosts.toDF("doc_id", "host")).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    assert(got("news.site.com.cn") === "site.com.cn")
    assert(got("portal.agency.gov.au") === "agency.gov.au")
    assert(got("author.blogspot.com") === "author.blogspot.com")
    assert(got("www.shop.brand.co.za") === "brand.co.za")
    assert(got("a.b.site.ck") === "b.site.ck")
    assert(got("www.ck") === "www.ck")
    assert(got("foo.www.ck") === "www.ck")
    assert(got("site.ck") === "site.ck")
    assert(got("city.kawasaki.jp") === "city.kawasaki.jp")
    assert(got("sub.ward.kawasaki.jp") === "sub.ward.kawasaki.jp")
    assert(got("deep.sub.example.com") === "example.com")
    assert(got("unlisted.host.zz") === "host.zz")
    assert(got("192.168.10.7") === "192.168.10.7")
    assert(got("intranet") === "intranet")
    assert(got("News.Bad.CO.UK.") === "bad.co.uk")
  }

  test("PslTable: the embedded publicsuffix.org snapshot loads complete and parses clean") {
    val rules = UrlOps.pslRulesFull
    assert(rules.size > 9000, s"full PSL expected ~9.5k rules, got ${rules.size}")
    // the list's grammar: wildcards only as the leftmost label
    assert(rules.filter(_.contains("*")).forall(_.startsWith("*.")))
    assert(rules.count(_.startsWith("!")) >= 8) // the exception family
    assert(rules.forall(r => !r.contains(" ") && !r.contains("'")))
    // every rule parses without throwing and round-trips its class
    rules.foreach(UrlOps.parsePslRule)
  }

  test("registeredDomainFull: map-only expression, full-table goldens incl. deep and out-of-excerpt rules") {
    val hosts = Seq(
      "news.site.com.cn"            -> "site.com.cn",
      "portal.agency.gov.au"        -> "agency.gov.au",
      "author.blogspot.com"         -> "author.blogspot.com",
      "www.shop.brand.co.za"        -> "brand.co.za",
      "a.b.site.ck"                 -> "b.site.ck",     // *.ck wildcard
      "www.ck"                      -> "www.ck",         // !www.ck exception
      "foo.www.ck"                  -> "www.ck",
      "site.ck"                     -> "site.ck",        // IS a public suffix
      "city.kawasaki.jp"            -> "city.kawasaki.jp",
      "sub.ward.x.kawasaki.jp"      -> "ward.x.kawasaki.jp", // *.kawasaki.jp: x.kawasaki.jp is public
      "deep.sub.example.com"        -> "example.com",
      "unlisted.host.zz"            -> "host.zz",        // implicit-* default
      "192.168.10.7"                -> "192.168.10.7",
      "intranet"                    -> "intranet",
      "News.Bad.CO.UK."             -> "bad.co.uk",
      // classes only the FULL list knows (out of the spec excerpt):
      "school.src0.pvt.k12.ma.us"   -> "src0.pvt.k12.ma.us", // 4-label rule
      "cdn.src0.art.pl"             -> "src0.art.pl",
      "x.y.compute.amazonaws.com"   -> "x.y.compute.amazonaws.com") // *.compute private rule
    val got = hosts.map(_._1).zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("doc_id", "host")
      .select($"host", UrlOps.registeredDomainFull($"host").as("reg_domain"))
      .as[(String, String)].collect().toMap
    hosts.foreach { case (h, want) => assert(got(h) === want, s"host $h") }
  }

  test("registeredDomainFull ≡ registeredDomainPsl(full rules): hostile cross-validation sweep") {
    // the expression and the broadcast-join form implement ONE
    // algorithm over ONE table — any drift between them is a bug in
    // whichever moved
    val rnd = new scala.util.Random(20260816L)
    val labels = Seq("www", "a", "b-1", "shop", "news", "x", "src0", "cdn", "city", "pvt")
    val tails = Seq("com", "co.uk", "com.cn", "ck", "kawasaki.jp", "k12.ma.us",
      "art.pl", "blogspot.com", "github.io", "zz", "jp", "us", "pl", "example")
    def pick[T](xs: Seq[T]) = xs(rnd.nextInt(xs.length))
    val hosts = (0 until 400).map { i =>
      val depth = rnd.nextInt(4)
      val base = (0 until depth).map(_ => pick(labels)).mkString(".")
      val h = (if (base.isEmpty) "" else base + ".") + pick(tails) +
        (if (rnd.nextInt(10) == 0) "." else "")
      (i.toLong, if (rnd.nextInt(7) == 0) h.toUpperCase else h)
    } ++ Seq((1000L, "192.168.1.4"), (1001L, "intranet"), (1002L, "www.ck"),
      (1003L, "foo.www.ck"), (1004L, "city.kawasaki.jp"), (1005L, ""))
    val df = hosts.toDF("doc_id", "host")
    val viaExpr = df.select($"doc_id", UrlOps.registeredDomainFull($"host").as("e"))
    val viaJoin = UrlOps.registeredDomainPsl(df)
      .select($"doc_id", $"reg_domain".as("j"))
    val drift = viaExpr.join(viaJoin, Seq("doc_id")).filter($"e" =!= $"j")
    assert(drift.count() === 0L, drift.collect().take(5).mkString("\n"))
  }

  test("domainCaps: cap enforced per registered domain, deterministic, under-cap passes whole") {
    val urls = (0L until 30L).map(i => (i, s"http://s${i % 3}.big.example.com/p/$i")) ++
      Seq((100L, "http://only.example.org/x"), (101L, "http://other.example.org/y"))
    val normed = UrlOps.urlNormalize(urls.toDF("doc_id", "url"))
    val got = UrlOps.domainCaps(normed, cap = 4).collect()
    val byDom = got.groupBy(_.getString(2)).view.mapValues(_.map(_.getLong(0)).sorted.toSeq)
    // all 30 big.example.com hosts share ONE registered domain -> 4 kept
    assert(byDom("example.com").size === 4)
    assert(byDom("example.org").toSeq.flatMap(x => Seq(x)).size === 2) // under cap: all kept
    // determinism: a second run selects the same ids
    val again = UrlOps.domainCaps(normed, cap = 4).collect()
      .filter(_.getString(2) == "example.com").map(_.getLong(0)).sorted.toSeq
    assert(again === byDom("example.com"))
    assertThrows[IllegalArgumentException](UrlOps.domainCaps(normed, cap = 0))
  }

  test("domainBlocklist: verdict rows flag the listed domains, nothing is silently dropped") {
    val normed = UrlOps.urlNormalize(Seq(
      (1L, "http://www.bad.example.com/x"),
      (2L, "http://fine.example.org/y"),
      (3L, "http://news.bad.co.uk/z"),
      (4L, "junk")).toDF("doc_id", "url"))
    val got = UrlOps.domainBlocklist(normed, Seq("example.com", "bad.co.uk")).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getBoolean(3)))).toMap
    assert(got.keySet === Set(1L, 2L, 3L)) // invalid row quarantined, valid ones ALL present
    assert(got(1L) === (("example.com", true)))
    assert(got(2L) === (("example.org", false)))
    assert(got(3L) === (("bad.co.uk", true)))
    assertThrows[IllegalArgumentException](UrlOps.domainBlocklist(normed, Seq.empty))
  }

  test("frontierReport: per-domain dup mass from normalized forms") {
    val urls = Seq(
      (1L, "http://a.example.com/x"),
      (2L, "HTTP://A.example.com/x/"),       // normalizes to the same
      (3L, "http://b.example.com/y"),        // same domain, new url
      (4L, "http://solo.example.org/z")).toDF("doc_id", "url")
    val got = UrlOps.frontierReport(UrlOps.urlNormalize(urls)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("example.com") === ((3L, 2L, 0.3333)))
    assert(got("example.org") === ((1L, 1L, 0.0)))
  }

  test("resolveRef: the complete RFC 3986 §5.4 example tables (fragments resolve to base by engine contract)") {
    val base = "http://a/b/c/d;p?q"
    // §5.4.1 normal + §5.4.2 abnormal examples. Divergence from the
    // RFC tables, both deliberate: fragments are dropped engine-wide
    // (url_norm has none), so '#s' and 'g#s' lose '#s'; and ';x'/type
    // refs are plain path segments (no special-casing), matching RFC.
    val cases = Seq(
      // --- normal
      "g" -> "http://a/b/c/g", "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/", "/g" -> "http://a/g",
      "//g" -> "http://g", "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y", "#s" -> "http://a/b/c/d;p?q",
      "g#s" -> "http://a/b/c/g", "g?y#s" -> "http://a/b/c/g?y",
      ";x" -> "http://a/b/c/;x", "g;x" -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y",
      "" -> "http://a/b/c/d;p?q", "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/", ".." -> "http://a/b/",
      "../" -> "http://a/b/", "../g" -> "http://a/b/g",
      "../.." -> "http://a/", "../../" -> "http://a/",
      "../../g" -> "http://a/g",
      // --- abnormal
      "../../../g" -> "http://a/g", "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g", "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.", ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..", "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g", "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h", "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      "g?y/./x" -> "http://a/b/c/g?y/./x",
      "g?y/../x" -> "http://a/b/c/g?y/../x",
      "http:g" -> "http:g")
    val got = cases.zipWithIndex.map { case ((r, _), i) => (i.toLong, base, r) }
      .toDF("doc_id", "base", "ref")
      .select(col("doc_id"), UrlOps.resolveRef(col("base"), col("ref")).as("out"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((ref, want), i) =>
      assert(got(i.toLong) === want, s"ref '$ref'")
    }
  }

  test("resolveRef edges: empty base path, scheme-less base quarantines, authority-only base") {
    val got = Seq(
      (1L, "http://h", "g"),            // empty base path → '/' dir
      (2L, "http://h", "?x"),           // empty base path + query ref
      (3L, "no-scheme-base", "g"),      // unparseable base → NULL
      (4L, "https://h:8443/a/b", "g"),  // non-default port rides origin
      (5L, "http://h/a/b", "mailto:x@y.z"))
      .toDF("doc_id", "base", "ref")
      .select(col("doc_id"), UrlOps.resolveRef(col("base"), col("ref")).as("out"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) === Some("http://h/g"))
    assert(got(2L) === Some("http://h?x"))
    assert(got(3L) === None)
    assert(got(4L) === Some("https://h:8443/a/g"))
    assert(got(5L) === Some("mailto:x@y.z"))
  }

  test("extractLinks: both quote forms, case-insensitive tag, occurrence-kept duplicates, is_web verdict") {
    val html = """<html><a href="g1">x</a><p><A Class='n' HREF='../g2'>y</A></p>""" +
      """<a href="g1">again</a><a data-x="1" href="//cdn.ex.org/l">p</a>""" +
      """<a href="mailto:a@b.c">m</a><a href="#top">t</a><area href="skip"></html>"""
    val rows = UrlOps.extractLinks(
      Seq((7L, "http://www.ex.com/d/page", html)).toDF("doc_id", "url_norm", "html"))
      .collect().map(r => (r.getString(2), r.getString(3), r.getBoolean(4)))
    // dq matches first (g1, g1, //cdn, mailto, #top), then sq (../g2)
    assert(rows.count(_._1 == "g1") === 2, "duplicate hrefs must keep both occurrences")
    val byHref = rows.map(t => t._1 -> ((t._2, t._3))).toMap // last wins, fine for distinct hrefs
    assert(byHref("g1") === (("http://www.ex.com/d/g1", true)))
    assert(byHref("../g2") === (("http://www.ex.com/g2", true)))
    assert(byHref("//cdn.ex.org/l") === (("http://cdn.ex.org/l", true)))
    assert(byHref("mailto:a@b.c") === (("mailto:a@b.c", false)))
    assert(byHref("#top") === (("http://www.ex.com/d/page", true)))
    assert(!rows.exists(_._1 == "skip"), "<area href> is out of the <a> contract")
  }

  test("robotsPatternRegex: wildcard, end anchor, literal-special escaping") {
    assert(UrlOps.robotsPatternRegex("/a/") === "^/a/")
    assert(UrlOps.robotsPatternRegex("/*x=") === "^/.*x=")
    assert(UrlOps.robotsPatternRegex("/p$") === "^/p$")
    // a '$' not at the end is a literal octet, and regex specials
    // in paths (dots, plus, parens) must not become operators
    assert(UrlOps.robotsPatternRegex("/a$b.c+(d)") === "^/a\\$b\\.c\\+\\(d\\)")
  }

  test("robotsVerdict: RFC 9309 specificity, tie-break, anchors, default allow") {
    val rules = Seq(
      ("example.com", false, "/fish"),        // blocks /fish*
      ("example.com", true, "/fish/"),        // longer allow carves the dir
      ("example.com", false, "/*.php$"),      // anchored wildcard
      ("example.com", false, "/tie"),         // equal-length pair:
      ("example.com", true, "/tie"))          //   allow must win
    val urls = Seq(
      (1L, "http://example.com/fish"),         // /fish (len 5) → blocked
      (2L, "http://example.com/fishheads"),    // prefix match → blocked
      (3L, "http://example.com/fish/salmon"),  // /fish/ (len 6) wins → allowed
      (4L, "http://example.com/x/page.php"),   // .php$ → blocked
      (5L, "http://example.com/x/page.php5"),  // NOT anchored-match → allowed, no rule
      (6L, "http://example.com/tie"),          // tie → allow wins
      (7L, "http://example.com/"),             // no match → default allow
      (8L, "http://other.org/fish"))           // ruleless domain → allowed
      .toDF("doc_id", "url")
    val got = UrlOps.robotsVerdict(UrlOps.urlNormalize(urls), rules).collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(3)), r.getBoolean(4)))).toMap
    assert(got(1L) === ((Some("/fish"), false)))
    assert(got(2L) === ((Some("/fish"), false)))
    assert(got(3L) === ((Some("/fish/"), true)))
    assert(got(4L) === ((Some("/*.php$"), false)))
    assert(got(5L) === ((None, true)))
    assert(got(6L) === ((Some("/tie"), true)))
    assert(got(7L) === ((None, true)))
    assert(got(8L) === ((None, true)))
  }

  test("resolveRef: resolved links are FIXED POINTS (absolute refs resolve to themselves)") {
    // the urlNormalize-idempotence discipline applied to the link
    // tier: every link extractLinks emits is absolute, so re-resolving
    // it against ANY base must return it unchanged — crawl frontiers
    // built from resolved links are stable under re-resolution.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lx = UrlOps.extractLinks(OpsEntries.linkFixture(docs), baseCol = "base")
      .filter(col("is_web"))
    val unstable = lx.select(col("link"),
        UrlOps.resolveRef(col("base"), col("link")).as("re"))
      .filter(col("re") =!= col("link") || col("re").isNull)
      .count()
    assert(unstable === 0L, "a resolved link changed under re-resolution")
  }

  test("robotsVerdict: verdict is invariant under rule-list order (the sortable-key contract)") {
    val rules = Seq(
      ("example.com", false, "/fish"), ("example.com", true, "/fish/"),
      ("example.com", false, "/*.php$"), ("example.com", false, "/tie"),
      ("example.com", true, "/tie"))
    val urls = Seq(
      (1L, "http://example.com/fish/x"), (2L, "http://example.com/fishy"),
      (3L, "http://example.com/a.php"), (4L, "http://example.com/tie"),
      (5L, "http://example.com/free")).toDF("doc_id", "url")
    def run(rs: Seq[(String, Boolean, String)]): Map[Long, (Option[String], Boolean)] =
      UrlOps.robotsVerdict(UrlOps.urlNormalize(urls), rs).collect()
        .map(r => r.getLong(0) -> ((Option(r.getString(3)), r.getBoolean(4)))).toMap
    val base = run(rules)
    assert(run(rules.reverse) === base)
    assert(run(new scala.util.Random(42).shuffle(rules)) === base) // seeded: reproducible take
  }

  test("anchorTextIndex: tokenized terms per target domain, distinct-source endorsement, inline-tag truncation") {
    val rows = Seq(
      (1L, "http://a.one.com/p",
        """<a href="http://www.two.com/x">Great Docs</a><a href='http://two.com/y'>docs</a>""" +
          """<a href="/nav">home nav</a><a href="http://two.com/z"><b>bold</b> lost</a>"""),
      (2L, "http://three.com/q",
        """<a href="http://two.com/x">docs again</a><a href="mailto:x@y.z">mail me</a>"""))
      .toDF("doc_id", "url_norm", "html")
    val got = UrlOps.anchorTextIndex(rows).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // 'docs' reaches two.com from one.com (twice: dq+sq) and three.com
    assert(got(("two.com", "docs")) === ((3L, 2L)))
    assert(got(("two.com", "great")) === ((1L, 1L)))   // tokenizer lowercases
    assert(got(("two.com", "again")) === ((1L, 1L)))
    // self-links index under the source's own domain
    assert(got(("one.com", "home")) === ((1L, 1L)))
    // an anchor starting with markup has no text before the first '<'
    assert(!got.contains(("two.com", "bold")) && !got.contains(("two.com", "lost")),
      "text after an inline tag is out of the contract")
    // mailto targets never reach the index
    assert(!got.keys.exists(_._2 == "mail"))
  }
}
