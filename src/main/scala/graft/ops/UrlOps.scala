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

  /** Multi-label public suffixes the registrable-domain heuristic
    * recognizes (a representative embedded subset; production would
    * load the full PSL as a broadcast dimension — the plan shape is
    * identical).
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

  /** Registrable domain of a host: the last two labels, or three when
    * the final two form a known multi-label public suffix (`co.uk` et
    * al). Pure array functions — no UDF.
    */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val suffix2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val take = least(when(suffix2.isin(multiLabelSuffixes: _*), lit(3))
      .otherwise(lit(2)), n)
    when(n >= 2, array_join(slice(labels, n - take + 1, take), "."))
      .otherwise(host)
  }

  /** Host canonicalization alone (the key for per-site statistics):
    * lowercase + `www.` strip.
    */
  def canonicalHost(u: Column): Column = {
    val rawHost = lower(try_parse_url(u, lit("HOST")))
    when(rawHost.startsWith("www."),
      rawHost.substr(lit(5), length(rawHost) - 4)).otherwise(rawHost)
  }
}
