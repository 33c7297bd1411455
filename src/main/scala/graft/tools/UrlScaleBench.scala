package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-curve experiment for the URL family (q142's operators): grow
  * a hash-derived messy-URL corpus m× and measure canonicalizeUrl +
  * PSL registrableDomain throughput. Both are pure scan-stage
  * expression pipelines (no shuffle, no UDF), so per-URL cost must
  * stay flat as the corpus grows — the 100 TB claim that executor
  * count is the only knob.
  *
  * Usage: runMain graft.tools.UrlScaleBench [sfDir] [scales]
  * (defaults: /root/testdata/sf0.1 and 1,10). One JSON line per scale;
  * paste into COVERAGE.md.
  */
object UrlScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("1,10").split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.expr.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDocs0 = spark.read.parquet(s"$sfDir/documents.parquet").count()

    // the q142 messy-URL generator shape, over synthetic ids
    def urls(m: Int) = {
      val u0 = pmod(xxhash64(col("id")), lit(1000000000L))
      val scheme = element_at(array(lit("http"), lit("HTTP"), lit("https"),
        lit("HTTPS")), (u0 % 4 + 1).cast("int"))
      val tld = element_at(array(lit(".com"), lit(".org"), lit(".co.uk"),
        lit(".de"), lit(".com.cn"), lit(".github.io"), lit(".gen.ck"),
        lit(".kawasaki.jp")), (u0 / 800 % 8 + 1).cast("int"))
      val host = concat(when(u0 / 4 % 2 === 1, lit("WwW.")).otherwise(lit("")),
        when(u0 / 8 % 2 === 1, lit("cdn.")).otherwise(lit("")),
        lit("site"), (u0 / 16 % 50).cast("string"), tld)
      spark.range(0, nDocs0 * m)
        .select(col("id"), concat(scheme, lit("://"), host,
          lit("/p/"), (u0 / 9600 % 100).cast("string"),
          lit("?utm_source=x&b="), (u0 % 10).cast("string"),
          lit("&a="), (u0 % 7).cast("string"), lit("#f")).as("url"))
        .repartition(cpus.toInt)
    }

    // r10: planning-time probe for both PSL lookup paths — the native
    // psl_domain expression (one plan node, static rule sets) vs the
    // column/InSet fallback that carries all ~10k rules as expression
    // literals. Timed on a 1-row frame so no execution cost leaks in;
    // min of 5 fresh plans after a discarded warmup (the first plan in
    // a JVM pays Catalyst classloading, not PSL size).
    locally {
      val one = spark.range(0, 1).select(
        concat(lit("https://a.b.site"), col("id").cast("string"),
          lit(".co.uk/p?x=1")).as("url"))
      def planOnce(dom: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
          : Double = {
        val t0 = System.nanoTime()
        one.select(dom(graft.ops.UrlOps.canonicalHost(col("url"))).as("d"))
          .queryExecution.executedPlan // force analyze+optimize+plan
        (System.nanoTime() - t0) / 1e3
      }
      def minOf5(dom: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
          : Double = { planOnce(dom); (1 to 5).map(_ => planOnce(dom)).min }
      val tNative = minOf5(graft.ops.UrlOps.registrableDomain)
      val tFallback = minOf5(graft.ops.UrlOps.registrableDomainColumns)
      println(f"""{"tool":"UrlScaleBench","plan_native_us":$tNative%.0f,""" +
        f""""plan_fallback_us":$tFallback%.0f,""" +
        s""""psl_rules":${graft.runtime.PslData.rules.size}}""")
    }

    for (m <- scales) {
      val c = urls(m).persist()
      val n = c.count() // materialize generation OUTSIDE the timing
      var t0 = System.nanoTime()
      val canon = c.select(graft.ops.UrlOps.canonicalizeUrl(col("url")).as("cu"))
        .filter(col("cu").isNotNull).count()
      val tCanon = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val doms = c.select(graft.ops.UrlOps.registrableDomain(
        graft.ops.UrlOps.canonicalHost(col("url"))).as("d"))
        .groupBy("d").count().count()
      val tDom = (System.nanoTime() - t0) / 1e9
      c.unpersist()
      println(f"""{"tool":"UrlScaleBench","scale":$m,"urls":$n,""" +
        f""""canon_s":$tCanon%.2f,"canon_urls_per_s":${canon / tCanon}%.0f,""" +
        f""""domains":$doms,"dom_s":$tDom%.2f,""" +
        f""""dom_urls_per_s":${n / tDom}%.0f}""")
    }
    spark.stop()
  }
}
