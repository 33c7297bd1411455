package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-curve experiment for exact substring dedup (q154): grow the
  * corpus m× — each replica under its own doc_id range with every 25th
  * document PLANTED as a cross-replica duplicate (a natural corpus's
  * duplicated fraction, per Lee et al., is a few percent — a
  * duplicate-heavy fixture would measure the join, not the prune) (same text, shifted
  * by a per-replica prefix so the duplicate run starts at a different
  * token offset — the unaligned case only stride-1 grams catch) — and
  * measure the full report end to end. The plan is one scan-side gram
  * hash (O(n·L) CPU, embarrassingly parallel), one 16-byte-keyed
  * census + join, one per-doc aggregate; per-doc cost must stay flat
  * as the corpus grows.
  *
  * Usage: runMain graft.tools.ExactSubstrScaleBench [sfDir] [scales]
  * (defaults: /root/testdata/sf0.1 and 1,10). One JSON line per
  * scale; paste into COVERAGE.md.
  */
object ExactSubstrScaleBench {
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

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))

    def corpus(m: Int) = (0 until m).map { r =>
      val shifted =
        if (r == 0) base.select(col("doc_id"), col("text"))
        else base.select((col("doc_id") + r * 2000000L).as("doc_id"),
          // unaligned cross-replica duplicate: a replica-specific prefix
          // shifts every shared run off its original token offset
          when(col("doc_id") % 25 === 0,
            concat(lit(s"replica $r prefix "), col("text")))
            // non-planted replicas must be GENUINELY unique: a prefix
            // alone leaves every interior gram identical across
            // replicas, turning the whole corpus into duplicates —
            // suffix every token so no cross-replica gram survives
            .otherwise(regexp_replace(col("text"), "(\\S+)", "$1r" + r))
            .as("text"))
      shifted
    }.reduce(_ unionAll _)

    // shuffle-bytes accounting: sum of stage shuffle WRITES across the
    // jobs a rep runs — the metric the Bloom position-prune moves
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = e.stageInfo.taskMetrics
          if (m != null)
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      })

    for (m <- scales) {
      val c = corpus(m).persist()
      val n = c.count() // materialize input OUTSIDE the timing
      def rep(bloom: Boolean): (Double, Long, Long) = {
        // stage-completion events land asynchronously; settle before
        // and after so the window belongs to this rep alone
        Thread.sleep(1000)
        shuffleBytes.set(0L)
        val t0 = System.nanoTime()
        val out = graft.ops.ExactSubstrDedup.report(c, "doc_id", "text", 8,
          bloomPrune = bloom, bloomMinDup = 1L)
        val dropped = out.agg(sum("n_dropped")).collect()(0).getLong(0)
        val t = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000)
        (t, dropped, shuffleBytes.get())
      }
      rep(bloom = true)
      val (t1, dropped, sb1) = rep(bloom = true)
      val (t2, _, sb2) = rep(bloom = true)
      // A/B: the pre-prune plan at the same scale — the full position
      // stream shuffles into the duplicated-gram join
      val (tB, droppedB, sbB) = rep(bloom = false)
      require(droppedB == dropped, s"A/B disagree: $dropped vs $droppedB")
      val t = math.min(t1, t2)
      val sb = math.min(sb1, sb2)
      c.unpersist()
      println(f"""{"tool":"ExactSubstrScaleBench","scale":$m,"docs":$n,""" +
        f""""dropped_tokens":$dropped,"wall_s":$t%.2f,""" +
        f""""shuffle_mb":${sb / 1e6}%.1f,"docs_per_s":${n / t}%.0f,""" +
        f""""nobloom_wall_s":$tB%.2f,"nobloom_shuffle_mb":${sbB / 1e6}%.1f}""")
    }
    spark.stop()
  }
}
