package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-bisection for q162's sf0.1 latency (delete or keep as
  * a profiling aid — not part of the contract surface).
  */
object Q162Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.expr.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s   rows=$n")
    }

    val q = graft.queries.PipelineQueries.pipeline
      .find(_.name == "q162_discovery_loop").get
    // warm codegen/scheduler
    time("warmup full")(q.fn(spark, d).count())
    time("rep full")(q.fn(spark, d).count())

    val docs = spark.read.parquet(s"$d/documents.parquet")
    val did = col("doc_id")
    def n(m: Long) = pmod(did, lit(m)).cast("string")
    val ds = did.cast("string")
    val base = concat(lit("https://h"), n(7), lit(".example.com/a"), n(5),
      lit("/page"), ds, lit(".html"))
    val html = concat(
      lit("<html><body>\n<a href=\"https://ext"), n(3), lit(".example.com/x"),
      ds, lit("\">e</a>\n<a href='//cdn"), n(4),
      lit(".example.com/lib.js'>c</a>\n<a href=/root/"), ds,
      lit("?z=1>r</a>\n<a href=\"sub/page"), ds,
      lit(".html\">s</a>\n<a href=\"?q="), ds,
      lit("&amp;r=2\">q</a>\n<a href=\"#sec\">f</a></body></html>"))
    val pages = docs.select(did, base.as("url"), html.as("html"))
    val links = pages.select(did, col("url"),
      posexplode(graft.ops.HtmlExtract.extractLinks(col("html")))
        .as(Seq("idx", "href")))
    time("extract links")(links.count())
    val resolved = links.select(did, col("idx"),
      graft.ops.UrlOps.resolveUrl(col("url"), col("href")).as("resolved"))
    time("+resolve")(resolved.count())
    val cand = resolved.select(did, col("idx"),
      graft.ops.UrlOps.canonicalizeUrl(col("resolved")).as("curl"))
    time("+canonicalize")(cand.count())
    val seen = pages.select(graft.ops.UrlOps.canonicalizeUrl(col("url"))
      .as("curl")).distinct()
    val fresh = cand.join(seen, Seq("curl"), "left_anti")
    time("+anti-join")(fresh.count())
    val disc = fresh.groupBy("curl").agg(min(did * 8 + col("idx")).as("disc_id"))
      .withColumn("host", graft.ops.UrlOps.canonicalHost(col("curl")))
    time("+ownership groupBy")(disc.count())
    val hostDigit = regexp_extract(col("host"), "^h([0-9]+)\\.", 1)
    val isH = hostDigit =!= ""
    val rules = when(isH, concat(
        lit("User-agent: *\nDisallow: /a"),
        ((hostDigit.cast("long") + 1) % 5).cast("string"),
        lit("/\nCrawl-delay: "),
        (hostDigit.cast("long") % 4 + 1).cast("string"), lit("\n")))
      .otherwise(lit(""))
    val path = regexp_replace(col("curl"), "^https?://[^/]*", "")
    val gated = disc
      .filter(call_function("robots_allowed", rules, lit("GraftBot/1.0"), path))
      .withColumn("score",
        ((col("disc_id") * lit(2654435761L)) % 997).cast("double"))
    time("+robots gate")(gated.count())
    val g2 = gated.localCheckpoint(true)
    time("checkpoint gated")(g2.count())
    val delays = g2.select(col("host"),
      when(isH, hostDigit.cast("long") % 4 + 1).otherwise(lit(1L))
        .as("crawl_delay_s")).distinct()
    val sched = graft.ops.Frontier.schedule(g2, "disc_id", "host",
      "score", delays, 3)
    time("+frontier")(sched.count())
    time("+join back")(
      sched.join(g2.select(col("disc_id"), col("curl")), "disc_id").count())
    spark.stop()
  }
}
