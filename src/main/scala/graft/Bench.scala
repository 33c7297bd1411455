package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: times every SparkEntry query at the driver-given scale
  * factor and prints ONE JSON line. Failures are reported per-query in an
  * "errors" map (never silently folded into a timing — a broken query must
  * not look like a fast green one).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.expr.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup: the first query otherwise absorbs all JVM/codegen/
    // scheduler startup (~2-3 s attributed to whatever sorts first)
    try {
      SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
      graft.synth.Synth.dataFrameAuto(spark, graft.api.CannedSources.iotSchemaJson, 100)
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    // best-of-N per query: single-run times carry >=2x run-to-run noise
    // (JVM/codegen warm-up, scheduler ordering), which drowns real
    // per-round deltas. The min over reps is the standard low-noise
    // estimator for a deterministic workload. Sub-second queries (where
    // relative noise is worst) get one extra rep.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2")
      .toIntOption.getOrElse(2).max(1)
    // optional comma-separated subset (local iteration aid; the driver
    // always benches the full suite)
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Streaming replays run LAST: alphabetical order put g100-g108 (state
    // store instances, checkpoint dirs, memory sinks, RocksDB native
    // memory) BEFORE every batch query in the same JVM, and r6 measured a
    // uniform ~1.5x suite-context slowdown on unchanged batch queries
    // (g51_columns_fast 3.3->9.0 s in-suite vs unchanged isolated).
    // Batch queries now see a streaming-free session; the streaming
    // family pays its own fixed costs at the end.
    val (streamQs, batchQs) = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .partition(_._1.contains("_stream"))
    def runOne(name: String, fn: (SparkSession, String) => DataFrame): Option[(String, Double)] = {
      val times = scala.collection.mutable.ArrayBuffer[Double]()
      var failed = false
      // first failure aborts this query's remaining reps (re-running a
      // broken query repeats an expensive failure and its fastest-failure
      // time is not a timing)
      def rep(): Unit = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          times += (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            failed = true
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
      }
      var i = 0
      while (i < reps && !failed) { rep(); i += 1 }
      if (!failed && times.nonEmpty && times.min < 1.0 && times.size < 3) rep()
      // a min above 20 s is either real or a transient I/O / compaction
      // window that both back-to-back reps sat in (observed: a 5 s query
      // timing 75 s twice right after a cache-churning phase). One extra
      // rep is bounded insurance: a transient window can't own the
      // headline number, a genuinely slow query just confirms itself.
      if (!failed && times.nonEmpty && times.min > 20.0 && times.size < reps + 1) rep()
      // disagreeing reps (max/min > 1.5x) mean at least one rep sat in a
      // transient window — r9's q98 recorded 4.4 s driver-side vs 1.8 s
      // local on UNTOUCHED code because both of its back-to-back reps
      // landed in one. One tie-breaker rep converges the min toward the
      // true time; agreeing reps (the common case) never pay it, and a
      // query that already earned an extra rep above doesn't pay twice
      // (the >20 s guard's rep IS the tie-breaker in that case).
      if (!failed && times.size >= 2 && times.size <= reps &&
        times.max / times.min > 1.5) rep()
      // errored queries get NO timing entry — a broken query must not
      // look like a fast green one
      if (failed) None else Some(name -> times.min)
    }
    val batchResults = batchQs.flatMap { case (n, f) => runOne(n, f) }
    // family boundary hygiene: drop anything cached and let the JVM
    // settle before the streaming replays start paying their own costs
    spark.catalog.clearCache()
    System.gc()
    val streamResults = streamQs.flatMap { case (n, f) => runOne(n, f) }
    val results = batchResults ++ streamResults

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // millisecond precision: sub-ms digits are pure noise and double the
    // line length, and the driver's tail capture has a byte budget — r4's
    // artifact lost half the per-query map to it
    def fmt(d: Double): String = f"$d%.3f"
    val qs = results.map { case (k, v) => s"${jstr(k)}:${fmt(v)}" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // family totals (r11, VERDICT r10 item 2): streaming rigs are
    // wall-heavy by design (checkpoint restarts, state stores) and their
    // count grows round over round — a single total made batch-family
    // regressions invisible and batch per-query numbers look noisy
    // (q99's phantom 1.8x in r10 was pure suite contention). The batch
    // family is the comparable round-over-round number; the streaming
    // family pays its own fixed costs under its own budget.
    val batchTotal = batchResults.map(_._2).sum
    val streamTotal = streamResults.map(_._2).sum
    println(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","batch_s":${fmt(batchTotal)},"streaming_s":${fmt(streamTotal)},"queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    // compact summary LAST so any tail-window truncation of the long line
    // above still leaves the total and the queries that matter most
    val slowest = results.sortBy(-_._2).take(10)
      .map { case (k, v) => s"${jstr(k)}:${fmt(v)}" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"summary","total_s":${fmt(total)},"batch_s":${fmt(batchTotal)},"streaming_s":${fmt(streamTotal)},"n_batch":${batchResults.size},"n_streaming":${streamResults.size},"n_queries":${results.size},"n_errors":${errors.size},"slowest":$slowest}""")
    spark.stop()
  }
}
