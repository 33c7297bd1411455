package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** RSS/Atom feed parsing — the OTHER standing discovery source next
  * to sitemaps ([[UrlOps.sitemapEntries]]): a crawl that polls feeds
  * learns of new pages hours before a sitemap regenerates, and feed
  * entries carry what sitemap entries lack — titles and publication
  * times, the freshness signals a frontier scheduler ranks by.
  *
  * Same implementation idiom as the sitemap layer, deliberately:
  * pure codegen'd regexp Columns (no UDF in the hot path), XML
  * comments stripped FIRST (a commented-out entry must not crawl),
  * CDATA unwrapped from titles (the de-facto RSS convention for
  * markup-bearing titles), and honest nulls for absent fields. The
  * two grammars differ where it matters and both are handled: RSS
  * `<item>` carries its link as ELEMENT TEXT (`<link>url</link>`)
  * and `<pubDate>`; Atom `<entry>` carries it as an ATTRIBUTE
  * (`<link href="url"/>`) and `<updated>`/`<published>`.
  */
object Feed {

  /** "rss" / "atom" / null — the routing column. */
  def feedKind(xml: Column): Column =
    when(xml.contains("<rss"), lit("rss"))
      .when(xml.contains("<feed"), lit("atom"))
      .otherwise(lit(null).cast("string"))

  private def unCdata(c: Column): Column =
    regexp_replace(c, "(?s)^\\s*<!\\[CDATA\\[(.*?)\\]\\]>\\s*$", "$1")

  /** One struct per `<item>`/`<entry>`: (link, title, published).
    * `link` prefers the Atom href attribute, falls back to RSS
    * element text; `published` coalesces pubDate / published /
    * updated in that order (the most-specific stamp wins).
    */
  def feedEntries(xml: Column): Column = {
    val clean = regexp_replace(coalesce(xml, lit("")),
      "(?s)<!--.*?-->", "")
    transform(
      regexp_extract_all(clean,
        lit("(?is)<(?:item|entry)[^>]*>(.*?)</(?:item|entry)>"), lit(1)),
      b => struct(
        coalesce(
          nullif(trim(regexp_extract(b,
            "(?is)<link[^>]*href=[\"']([^\"']*)[\"']", 1)), lit("")),
          nullif(trim(regexp_extract(b,
            "(?is)<link[^>]*>([^<]*?)</link>", 1)), lit("")))
          .as("link"),
        nullif(trim(unCdata(regexp_extract(b,
          "(?is)<title[^>]*>(.*?)</title>", 1))), lit("")).as("title"),
        coalesce(
          nullif(trim(regexp_extract(b,
            "(?is)<pubDate>(.*?)</pubDate>", 1)), lit("")),
          nullif(trim(regexp_extract(b,
            "(?is)<published>(.*?)</published>", 1)), lit("")),
          nullif(trim(regexp_extract(b,
            "(?is)<updated>(.*?)</updated>", 1)), lit("")))
          .as("published")))
  }
}
