package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-scale corpora: the normalization pass
  * that runs BEFORE any URL-keyed dedup, so the same page fetched as
  * `HTTP://WwW.Site.com:80/p/?utm_source=x&q=1#top` and
  * `http://site.com/p?q=1` collapses to one key.
  *
  * Canonical form: lowercase scheme and host, `www.` prefix stripped,
  * default ports (http:80 / https:443) stripped, fragment dropped,
  * tracking parameters (utm_*, fbclid, gclid, ref) removed, remaining
  * query parameters sorted, one trailing path slash stripped. The whole
  * pass is a composition of native expressions (parse_url + codegen'd
  * higher-order array functions) — a pure scan stage, no UDF, no
  * shuffle; at 100 TB it rides the same embarrassingly-parallel decode
  * lane as the multimodal ops. Unparseable URLs degrade to null (a
  * filterable column), never a task failure.
  */
object UrlOps {

  /** Query parameters dropped by canonicalization (prefix match for
    * `utm_`, exact key match for the rest).
    */
  val trackingPrefixes: Seq[String] = Seq("utm_")
  val trackingKeys: Seq[String] = Seq("fbclid", "gclid", "ref")

  /** Multi-label public suffixes the pre-r9 heuristic recognized; kept
    * for source compatibility. The real implementation is PSL-backed —
    * see [[registrableDomain]] and [[graft.runtime.PslData]].
    */
  val multiLabelSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "com.br", "co.in")

  private def dropTracking(params: Column): Column =
    filter(params, p => {
      val key = split_part(p, lit("="), lit(1))
      val isTracking = trackingPrefixes
        .map(pre => key.startsWith(pre))
        .reduce(_ || _) || key.isin(trackingKeys: _*)
      !isTracking && p =!= ""
    })

  /** The canonical URL (see object doc for the rules). Null for inputs
    * parse_url cannot parse a host out of.
    */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(try_parse_url(u, lit("PROTOCOL")))
    val rawHost = lower(try_parse_url(u, lit("HOST")))
    val host = when(rawHost.startsWith("www."),
      rawHost.substr(lit(5), length(rawHost) - 4)).otherwise(rawHost)
    // port lives only in AUTHORITY; keep it unless it is the scheme default
    val authority = coalesce(try_parse_url(u, lit("AUTHORITY")), lit(""))
    val port = regexp_extract(authority, ":(\\d+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val portPart = when(keepPort, concat(lit(":"), port)).otherwise(lit(""))
    val rawPath = coalesce(try_parse_url(u, lit("PATH")), lit(""))
    val path = when(rawPath === "/", lit("/"))
      .otherwise(regexp_replace(rawPath, "/$", ""))
    val params = dropTracking(
      split(coalesce(try_parse_url(u, lit("QUERY")), lit("")), "&"))
    val queryPart = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&"))).otherwise(lit(""))
    when(rawHost.isNotNull && scheme.isNotNull,
      concat(scheme, lit("://"), host, portPart, path, queryPart))
  }

  /** Registrable domain of a host under FULL publicsuffix.org
    * semantics: exception rules win, else the longest matching rule
    * (normal rules match their own label count; a wildcard rule
    * `*.base` makes every `<label>.base` a public suffix), else the
    * implicit default rule `*` (every bare TLD is a public suffix).
    * The registrable domain is the public suffix plus one label; NULL
    * when the host IS a public suffix (e.g. `gen.ck`, `github.io`) or
    * has no extra label.
    *
    * r10, with the full ~10k-rule PSL bundled: the default path is the
    * native codegen'd [[graft.expr.PslDomain]] expression probing
    * JVM-static rule sets — ONE plan node, no rule literals in the
    * expression tree or the task binary (the r9 column composition
    * carried each rule as an InSet literal, which at 10k rules cost
    * ~350 ms of analyzer walk per plan and ~1.1 MB per task binary).
    * The pure-column InSet form below remains the fallback for
    * sessions without GraftExtensions; UrlOpsSpec pins both paths to
    * identical output.
    */
  def registrableDomain(host: Column): Column = {
    // ambient-session probe, non-throwing: with no active/default
    // session (pure column construction, the r9 contract) or without
    // GraftExtensions registered, fall back to the column composition.
    // The probe binds to the construction-time session — the same
    // trade every functionExists-gated native lowering in ops/ makes.
    val native = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .exists(s => try s.catalog.functionExists("psl_domain")
        catch { case _: Exception => false })
    if (native)
      org.apache.spark.sql.functions.call_function("psl_domain", host)
    else registrableDomainColumns(host)
  }

  /** The no-extensions fallback: full PSL semantics in pure array
    * functions + `isin` membership (each rule set an InSet literal).
    */
  private[graft] def registrableDomainColumns(host: Column): Column = {
    import graft.runtime.PslData
    val labels = split(host, "\\.")
    val n = size(labels)
    def suffix(k: Int): Column = array_join(slice(labels, -k, k), ".")
    def inSet(c: Column, s: Set[String]): Column =
      if (s.isEmpty) lit(false) else c.isin(s.toSeq: _*)
    // exception rules: k matching labels -> public suffix of k-1
    val excLen = PslData.excByLen.keys.toSeq.sorted.reverse
      .foldLeft(lit(null).cast("int")) { (acc, k) =>
        coalesce(acc, when(n >= k &&
          inSet(suffix(k), PslData.excByLen(k)), lit(k - 1)))
      }
    // longest normal/wildcard match: try candidate lengths descending
    val bestLen = (2 to PslData.maxPsLen).reverse
      .foldLeft(lit(null).cast("int")) { (acc, k) =>
        val normalHit = PslData.normalByLen.get(k)
          .map(s => inSet(suffix(k), s)).getOrElse(lit(false))
        val wildHit = PslData.wildBaseByLen.get(k - 1)
          .map(s => inSet(suffix(k - 1), s)).getOrElse(lit(false))
        coalesce(acc, when(n >= k && (normalHit || wildHit), lit(k)))
      }
    val psLen = coalesce(excLen, bestLen, lit(1))
    when(host.isNotNull && (n > psLen),
      array_join(slice(labels, -(psLen + lit(1)), psLen + lit(1)), "."))
  }

  /** Host canonicalization alone (the key for per-site statistics):
    * lowercase + `www.` strip.
    */
  def canonicalHost(u: Column): Column = {
    val rawHost = lower(try_parse_url(u, lit("HOST")))
    when(rawHost.startsWith("www."),
      rawHost.substr(lit(5), length(rawHost) - 4)).otherwise(rawHost)
  }

  /** Sitemap URLs declared in a robots.txt body, as an array (r11).
    * Sitemap lines are UNGROUPED per the sitemaps.org protocol —
    * they apply to every crawler regardless of user-agent groups, so
    * this is a pure regexp extract, not group selection: line-anchored,
    * case-insensitive, comment tails stripped, values trimmed. Java
    * regex and RE2 agree on every construct used, so an oracle replays
    * it (q152).
    */
  def robotsSitemaps(rules: Column): Column =
    filter(
      transform(
        regexp_extract_all(rules,
          lit("(?im)^[ \\t]*sitemap[ \\t]*:[ \\t]*([^#\\r\\n]*)"), lit(1)),
        v => trim(v)),
      v => v =!= "")

  /** RFC 3986 §5.2.4 remove_dot_segments over a path string, as pure
    * array-fold Columns. A trailing bare "." / ".." segment gets a
    * slash appended first so the fold's trailing empty segment yields
    * the RFC's trailing slash ("/a/b/.." → "/a/"). The ".." pop keeps
    * the leading root marker (split's leading "" on absolute paths),
    * matching the RFC's silent-discard above root.
    */
  private def removeDotSegments(p: Column): Column = {
    val p2 = when(p.rlike("(^|/)\\.\\.?$"), concat(p, lit("/"))).otherwise(p)
    val folded = aggregate(split(p2, "/"), array().cast("array<string>"),
      (acc, s) =>
        when(s === ".", acc)
          .when(s === "..",
            when(size(acc) > 1, slice(acc, lit(1), size(acc) - 1)).otherwise(acc))
          .otherwise(concat(acc, array(s))))
    array_join(folded, "/")
  }

  /** RFC 3986 §5 reference resolution — the step between
    * [[graft.ops.HtmlExtract.extractLinks]] and the frontier: a page's
    * raw hrefs (absolute, protocol-relative, root-relative, query-only,
    * fragment-only, or path-relative with dot segments) become
    * absolute crawl candidates against the page's own URL. The base
    * must be an absolute hierarchical URL (every fetched page's is); a
    * ref with its own scheme (mailto:, javascript:, https:) passes
    * through for the caller's scheme gate. Validated against the RFC's
    * own §5.4 reference-example vectors (UrlOpsSpec), normal AND
    * abnormal.
    */
  def resolveUrl(base: Column, ref0: Column): Column = {
    val ref = coalesce(ref0, lit(""))
    val b = coalesce(base, lit(""))
    val scheme = regexp_extract(b, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    val authority = regexp_extract(b, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val bpath = regexp_extract(b,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val root = concat(scheme, lit("://"), authority)
    val baseNoFrag = regexp_replace(b, "#.*", "")
    val dir = when(bpath === "", lit("/"))
      .otherwise(regexp_replace(bpath, "[^/]*$", ""))
    // the ref's path part folds through dot-removal; its ?query#frag
    // tail rides along untouched
    val refPath = regexp_extract(ref, "^([^?#]*)", 1)
    val refTail = substring(ref, length(refPath) + 1, lit(Int.MaxValue))
    when(ref.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), ref)
      .when(ref.startsWith("//"), concat(scheme, lit(":"), ref))
      .when(ref === "", baseNoFrag)
      .when(ref.startsWith("#"), concat(baseNoFrag, ref))
      .when(ref.startsWith("?"),
        concat(root, when(bpath === "", lit("/")).otherwise(bpath), ref))
      .when(ref.startsWith("/"),
        concat(root, removeDotSegments(refPath), refTail))
      .otherwise(
        concat(root, removeDotSegments(concat(dir, refPath)), refTail))
  }

  /** Sitemap XML (the sitemaps.org protocol — where robotsSitemaps'
    * URLs POINT): "index" for a <sitemapindex> (entries are child
    * sitemap files), "urlset" for a leaf page list, null otherwise.
    */
  def sitemapKind(xml: Column): Column =
    when(xml.contains("<sitemapindex"), lit("index"))
      .when(xml.contains("<urlset"), lit("urlset"))
      .otherwise(lit(null).cast("string"))

  /** One struct per <url>/<sitemap> entry: (loc, lastmod, priority_ppm)
    * — priority as exact parts-per-million (decimal arithmetic, no
    * doubles, per the repo's oracle convention). XML comments are
    * stripped FIRST (a commented-out entry must not crawl — the same
    * trap HtmlExtract pins for HTML). Pure codegen'd regexp Columns;
    * every construct (inline (?is), non-greedy, alternation) behaves
    * identically in Java regex and RE2, so an oracle can replay it.
    */
  def sitemapEntries(xml: Column): Column = {
    val clean = regexp_replace(coalesce(xml, lit("")),
      "(?s)<!--.*?-->", "")
    transform(
      regexp_extract_all(clean,
        lit("(?is)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"), lit(1)),
      b => struct(
        trim(regexp_extract(b, "(?is)<loc>(.*?)</loc>", 1)).as("loc"),
        nullif(trim(regexp_extract(b, "(?is)<lastmod>(.*?)</lastmod>", 1)),
          lit("")).as("lastmod"),
        // try_cast, not cast: a malformed <priority> ("high", "1,0")
        // in real-world sitemap XML must surface as a null ppm, not an
        // ANSI runtime error that fails the whole job (r11 advice) —
        // the same honest-null handling lastmod and empty values get
        (nullif(trim(regexp_extract(b, "(?is)<priority>(.*?)</priority>", 1)),
          lit("")).try_cast("decimal(8,6)") * 1000000)
          .cast("long").as("priority_ppm")))
  }
}
