package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.UrlOps

class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[Option[String]] = {
    val df = urls.zipWithIndex.map { case (u, i) => (i, u) }.toDF("i", "url")
    df.orderBy("i").select(UrlOps.canonicalizeUrl(col("url")))
      .collect().toSeq.map(r => Option(r.getString(0)))
  }

  test("canonicalization rules: case, www, default port, tracking params, sort, fragment, slash") {
    assert(canon(
      "HTTP://WwW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
      "https://example.com:443/a?gclid=1&fbclid=2&ref=x&z=9",
      "https://example.com:8443/a",       // non-default port kept
      "http://example.com/",              // root path stays "/"
      "http://example.com/a%20b?q=1"      // encoded path untouched
    ) == Seq(
      Some("http://example.com/a/b?a=1&b=2"),
      Some("https://example.com/a?z=9"),
      Some("https://example.com:8443/a"),
      Some("http://example.com/"),
      Some("http://example.com/a%20b?q=1")))
  }

  test("idempotence: canonicalizing a canonical URL is a no-op") {
    val once = canon(
      "HTTP://WwW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
      "https://Sub.Example.co.uk:9090/x/?utm_medium=m&k=v").map(_.get)
    assert(canon(once: _*).map(_.get) == once)
  }

  test("unparseable input degrades to null, never a failure") {
    assert(canon("not a url at all", "://nope", "http//missing.colon")
      == Seq(None, None, None))
  }

  test("registrableDomain handles multi-label suffixes and deep subdomains") {
    val hosts = Seq("a.b.site.co.uk", "site.co.uk", "cdn.site.com",
      "site.com").toDF("h")
    val got = hosts.select(UrlOps.registrableDomain(col("h"))).collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("site.co.uk", "site.co.uk", "site.com", "site.com"))
  }

  private def reg(hosts: String*): Seq[Option[String]] = {
    val df = hosts.zipWithIndex.map { case (h, i) => (i, h) }.toDF("i", "h")
    df.orderBy("i").select(UrlOps.registrableDomain(col("h")))
      .collect().toSeq.map(r => Option(r.getString(0)))
  }

  test("registrableDomain implements full PSL semantics") {
    // normal multi-label rules the old 7-suffix heuristic missed
    assert(reg("site.com.cn", "a.b.site.com.cn", "shop.co.kr")
      == Seq(Some("site.com.cn"), Some("site.com.cn"), Some("shop.co.kr")))
    // private-section suffixes: github.io is a public suffix
    assert(reg("user.github.io", "deep.user.github.io", "github.io")
      == Seq(Some("user.github.io"), Some("user.github.io"), None))
    // wildcard rules: *.ck makes every <label>.ck a public suffix
    assert(reg("site.gen.ck", "a.site.gen.ck", "gen.ck")
      == Seq(Some("site.gen.ck"), Some("site.gen.ck"), None))
    // exception rules: !www.ck carves www.ck back out of *.ck
    assert(reg("www.ck", "a.www.ck")
      == Seq(Some("www.ck"), Some("www.ck")))
    // japanese prefecture-city wildcard + the city exception
    assert(reg("site.kawasaki.jp", "cdn.site.kawasaki.jp",
      "city.kawasaki.jp", "ward.city.kawasaki.jp")
      == Seq(None, Some("cdn.site.kawasaki.jp"),
        Some("city.kawasaki.jp"), Some("city.kawasaki.jp")))
    // default rule: a bare TLD or single label is a public suffix
    assert(reg("localhost", "com", "example.arpa")
      == Seq(None, None, Some("example.arpa")))
  }

  test("the bundled full PSL covers rules absent from the r9 subset") {
    // ICANN rules the subset never listed: co.bw now resolves as a
    // 2-label public suffix instead of falling to the default rule
    assert(reg("site.co.bw", "a.site.co.bw", "co.bw")
      == Seq(Some("site.co.bw"), Some("site.co.bw"), None))
    // private-section rules beyond the subset's hosting shortlist
    assert(reg("team.bitbucket.io", "bitbucket.io")
      == Seq(Some("team.bitbucket.io"), None))
    // 3-label wildcard base: *.compute.amazonaws.com makes each
    // region directory a public suffix of FOUR labels
    assert(reg("eu-west-1.compute.amazonaws.com",
      "vm.eu-west-1.compute.amazonaws.com",
      "x.vm.eu-west-1.compute.amazonaws.com")
      == Seq(None, Some("vm.eu-west-1.compute.amazonaws.com"),
        Some("vm.eu-west-1.compute.amazonaws.com")))
    // IDN rules match in punycode form (crawl hostnames arrive
    // xn---encoded): 公司.cn == xn--55qx5d.cn
    assert(reg("site.xn--55qx5d.cn", "xn--55qx5d.cn")
      == Seq(Some("site.xn--55qx5d.cn"), None))
    // sanity on the parse itself: full list loaded, all rule families
    import graft.runtime.PslData
    assert(PslData.rules.size > 9000, s"only ${PslData.rules.size} rules")
    assert(PslData.normalByLen(1).contains("com"))
    assert(PslData.excByLen(3).contains("city.kawasaki.jp"))
    assert(PslData.wildBaseByLen(3).contains("compute.amazonaws.com"))
  }

  test("the native psl_domain expression and the column fallback agree on every rule family") {
    val hosts = Seq("site.com", "a.b.site.co.uk", "site.co.uk",
      "site.com.cn", "user.github.io", "github.io", "site.gen.ck",
      "gen.ck", "www.ck", "site.kawasaki.jp", "cdn.site.kawasaki.jp",
      "city.kawasaki.jp", "ward.city.kawasaki.jp", "site.co.bw",
      "team.bitbucket.io", "vm.eu-west-1.compute.amazonaws.com",
      "site.xn--55qx5d.cn", "localhost", "com", "example.arpa", "")
    val df = hosts.zipWithIndex.map { case (h, i) => (i, h) }.toDF("i", "h")
      .orderBy("i")
    val native = df.select(UrlOps.registrableDomain(col("h"))).collect()
      .map(r => Option(r.getString(0))).toSeq
    val cols = df.select(UrlOps.registrableDomainColumns(col("h"))).collect()
      .map(r => Option(r.getString(0))).toSeq
    assert(native == cols, hosts.zip(native.zip(cols)).filter {
      case (_, (a, b)) => a != b
    }.mkString(", "))
    // and the session under test really does route through the native
    // expression (extensions registered by the fixture)
    assert(spark.catalog.functionExists("psl_domain"))
  }

  test("robots_allowed implements RFC 9309: groups, longest-match, wildcards, ties") {
    import graft.expr.RobotsAllowed.{allowed, patternMatches}
    val txt =
      """# example file
        |User-agent: googlebot
        |Disallow: /nogoogle/
        |
        |User-agent: *
        |Disallow: /private/
        |Allow: /private/open*$
        |Disallow: /tmp*
        |""".stripMargin
    // the * group applies to an unlisted agent
    assert(allowed(txt, "GraftBot/1.0", "/index.html"))
    assert(!allowed(txt, "GraftBot/1.0", "/private/x"))
    assert(allowed(txt, "GraftBot/1.0", "/private/open-door"))
    assert(!allowed(txt, "GraftBot/1.0", "/tmp/file"))
    // the specific group SHADOWS the * group entirely
    assert(!allowed(txt, "Googlebot/2.1", "/nogoogle/a"))
    assert(allowed(txt, "Googlebot/2.1", "/private/x"),
      "a selected specific group must hide the * group's rules")
    // longest-match precedence and the allow-on-tie rule
    val tie = "User-agent: *\nDisallow: /page\nAllow: /page\n"
    assert(allowed(tie, "x", "/page"), "equal lengths tie to allow")
    val longer = "User-agent: *\nAllow: /page\nDisallow: /page/sub\n"
    assert(!allowed(longer, "x", "/page/sub/x"))
    assert(allowed(longer, "x", "/page/other"))
    // multiple user-agent lines share one rule block; groups merge
    val multi = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert(!allowed(multi, "b", "/x1") && allowed(multi, "c", "/x1"))
    // empty-value Disallow means allow-all; empty file means allow-all
    assert(allowed("User-agent: *\nDisallow:\n", "x", "/anything"))
    assert(allowed("", "x", "/anything"))
    // pattern matcher edges
    assert(patternMatches("/a*c$", "/abc"))
    assert(!patternMatches("/a*c$", "/abcd"))
    assert(patternMatches("/a*b*c", "/a-b-c-d"))
    assert(!patternMatches("/a*b*c", "/a-c-b"))
    assert(patternMatches("/fish*$", "/fishheads"))
    assert(!patternMatches("/fish$", "/fishheads"))
    assert(patternMatches("/fish$", "/fish"))
    // the SQL face: null robots yields null (unknown, not permission)
    val r = Seq((1L, null.asInstanceOf[String], "/p")).toDF("id", "rules", "path")
      .select(call_function("robots_allowed", col("rules"),
        lit("x"), col("path"))).collect().head
    assert(r.isNullAt(0))
  }

  test("robots parse cap, crawl-delay group selection, sitemap extraction") {
    import graft.expr.RobotsAllowed.{allowed, crawlDelay, ParseCap}
    // cap boundary: a disallow line ENDING exactly at the cap is
    // honored; push it one byte past and it vanishes (RFC 9309 §2.5 —
    // content beyond 500 KiB may be ignored; we honor exactly the
    // lines fully inside it)
    val head = "User-agent: *\n"
    val rule = "Disallow: /y\n"
    def padded(slack: Int): String = {
      val padLen = ParseCap - head.length - rule.length - slack
      head + ("#" * (padLen - 1) + "\n") + rule
    }
    assert(!allowed(padded(0), "bot", "/y/z"), "rule ending AT the cap must hold")
    assert(allowed(padded(-1), "bot", "/y/z"), "rule past the cap must be ignored")
    // a monster single line (no newline inside the cap) parses as empty
    assert(allowed("#" * (ParseCap + 10) + "\nDisallow: /\n", "bot", "/p"))
    // crawl-delay rides group selection: specific group shadows *
    val rules = "User-agent: graftbot\nCrawl-delay: 2.5\nDisallow: /p/\n\n" +
      "User-agent: *\nCrawl-delay: 10\n"
    assert(crawlDelay(rules, "GraftBot/1.0") == 2.5)
    assert(crawlDelay(rules, "otherbot") == 10.0)
    assert(crawlDelay("User-agent: *\nDisallow: /\n", "x") == null)
    assert(crawlDelay("User-agent: *\nCrawl-delay: soon\n", "x") == null,
      "unparsable delay is null, not a crash")
    // merged same-specificity groups keep the LARGEST (politest) delay
    val merged = "User-agent: *\nCrawl-delay: 3\n\nUser-agent: *\nCrawl-delay: 7\n"
    assert(crawlDelay(merged, "x") == 7.0)
    // sitemaps: ungrouped, mixed case, comments stripped, blanks dropped
    val sm = Seq((1L,
      "User-agent: a\nSitemap: https://s/1.xml # main\n" +
        "sitemap:https://s/2.xml\nSITEMAP:   \nDisallow: /\n"))
      .toDF("id", "rules")
      .select(graft.ops.UrlOps.robotsSitemaps(col("rules")))
      .collect().head.getSeq[String](0)
    assert(sm == Seq("https://s/1.xml", "https://s/2.xml"))
  }

  test("utm_ prefix filters any utm param; only whole-key matches drop for the rest") {
    assert(canon("http://x.com/p?utm_campaign=c&utm_id=7&refresh=1&ref=drop")
      == Seq(Some("http://x.com/p?refresh=1")))
  }

  test("sitemap entries: comment trap, optional fields, exact ppm, kind detection") {
    import graft.ops.UrlOps
    def parse(xml: String): Seq[(String, String, Any)] =
      Seq((1L, xml)).toDF("id", "xml")
        .select(explode(UrlOps.sitemapEntries(col("xml"))).as("e"))
        .select("e.loc", "e.lastmod", "e.priority_ppm")
        .collect().map(r => (r.getString(0), r.getString(1),
          if (r.isNullAt(2)) null else r.getLong(2))).toSeq
    val xml = """<?xml version="1.0"?>
      <urlset>
        <!-- <url><loc>https://no.example.com/commented</loc></url> -->
        <url><loc>  https://a.example.com/1 </loc>
          <lastmod>2026-05-01</lastmod><priority>0.55</priority></url>
        <url><loc>https://a.example.com/2</loc></url>
      </urlset>"""
    assert(parse(xml) == Seq(
      ("https://a.example.com/1", "2026-05-01", 550000L),
      ("https://a.example.com/2", null, null)))
    // malformed priority ("high", "1,0") is honest-null, never an ANSI
    // runtime error killing the job (r11 advice: try_cast, not cast)
    val bad = "<urlset><url><loc>https://x/a</loc><priority>high</priority>" +
      "</url><url><loc>https://x/b</loc><priority>1,0</priority></url></urlset>"
    assert(parse(bad) == Seq(
      ("https://x/a", null, null), ("https://x/b", null, null)))
    // non-greedy blocks: entries never merge across </url><url> seams
    val two = "<urlset><url><loc>https://x/1</loc></url>" +
      "<url><loc>https://x/2</loc></url></urlset>"
    assert(parse(two).map(_._1) == Seq("https://x/1", "https://x/2"))
    // sitemapindex children + kind
    val idx = "<sitemapindex><sitemap><loc>https://x/s1.xml</loc></sitemap>" +
      "</sitemapindex>"
    assert(parse(idx).map(_._1) == Seq("https://x/s1.xml"))
    val kinds = Seq((1L, idx), (2L, two), (3L, "plain text"))
      .toDF("id", "xml")
      .select(col("id"), UrlOps.sitemapKind(col("xml")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds == Map(1L -> "index", 2L -> "urlset", 3L -> null))
    // null/empty input yields no entries, not a crash
    assert(parse("") == Seq.empty)
  }

  test("resolveUrl matches every RFC 3986 section 5.4 reference vector") {
    import graft.ops.UrlOps
    val base = "http://a/b/c/d;p?q"
    // the RFC's own normal + abnormal examples (strict parser)
    val vectors = Seq(
      "g:h" -> "g:h", "g" -> "http://a/b/c/g", "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/", "/g" -> "http://a/g", "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y", "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q#s", "g#s" -> "http://a/b/c/g#s",
      "g?y#s" -> "http://a/b/c/g?y#s", ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x", "g;x?y#s" -> "http://a/b/c/g;x?y#s",
      "" -> "http://a/b/c/d;p?q", "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/", ".." -> "http://a/b/",
      "../" -> "http://a/b/", "../g" -> "http://a/b/g",
      "../.." -> "http://a/", "../../" -> "http://a/",
      "../../g" -> "http://a/g",
      // abnormal
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
      "g#s/./x" -> "http://a/b/c/g#s/./x",
      "g#s/../x" -> "http://a/b/c/g#s/../x",
      "http:g" -> "http:g")
    val got = vectors.map(_._1).toDF("ref")
      .select(col("ref"), UrlOps.resolveUrl(lit(base), col("ref")).as("r"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((ref, want) <- vectors)
      assert(got(ref) == want, s"ref='$ref'")
  }

  test("extractLinks: quotings, attribute order, comment/script traps, &amp;") {
    import graft.ops.{HtmlExtract, UrlOps}
    def links(html: String): Seq[String] =
      Seq((1L, html)).toDF("id", "html")
        .select(HtmlExtract.extractLinks(col("html")).as("ls"))
        .collect().head.getSeq[String](0)
    val html = """<html><body>
      <a href="/dq">double</a>
      <a class="x" href='/sq'>attr before, single</a>
      <a href=/uq>unquoted</a>
      <a href="?q=1&amp;r=2">amp decodes</a>
      <!-- <a href="/commented">no</a> -->
      <script>var a = '<a href="/scripted">no</a>';</script>
      <a name="anchor-only">no href</a>
      <a href="">empty href drops (a self-reference is never a new crawl)</a>
      </body></html>"""
    assert(links(html) == Seq("/dq", "/sq", "/uq", "?q=1&r=2"))
    // resolution composes: every extracted href becomes absolute
    val resolved = Seq((1L, html)).toDF("id", "html")
      .select(explode(HtmlExtract.extractLinks(col("html"))).as("h"))
      .select(UrlOps.resolveUrl(lit("https://h.example.com/a/page.html"),
        col("h")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(resolved == Seq(
      "https://h.example.com/dq", "https://h.example.com/sq",
      "https://h.example.com/uq",
      "https://h.example.com/a/page.html?q=1&r=2"))
  }
}
