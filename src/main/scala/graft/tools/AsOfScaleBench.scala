package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve experiment for the two as-of join lowerings: the
  * union + last-ignoreNulls window (ops/AsOfJoin.asOf) vs the native
  * merge-pass operator (asOfNative → AsOfJoinExec). The events table
  * is replicated m× with disjoint user-id ranges per replica (new
  * keys, same per-key density — the way a crawl's key space actually
  * grows), and each lowering answers the same click→last-error as-of
  * query.
  *
  * What this isolates: both plans shuffle the same rows once, but the
  * window form then sorts the UNION of both sides as one dataset and
  * evaluates a running last() frame over it, while the native exec
  * sorts each (smaller) side independently and streams them through a
  * single merge pass holding one buffered right row. Same answer —
  * the harness asserts count equality — different constant factors.
  *
  * Usage: runMain graft.tools.AsOfScaleBench [sfDir] [scales]
  * (defaults: /root/testdata/sf0.1 and 1,2,5,10). Output: one JSON
  * line per (scale, engine); paste the table into COVERAGE.md.
  */
object AsOfScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("1,2,5,10").split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.expr.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val ev = graft.queries.EventTs.toNanos(
      spark.read.parquet(s"$sfDir/events.parquet"))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val maxUser = ev.agg(max("user_id")).collect()(0).getLong(0) + 1

    def corpusAt(m: Int): DataFrame =
      (0 until m).map { r =>
        if (r == 0) ev
        else ev.select((col("user_id") + lit(r * maxUser)).as("user_id"),
          col("event_id"), col("ts"), col("event_type"))
      }.reduce(_.unionByName(_))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // wide-payload variant: the union lowering must carry every left
    // column through the union — each RIGHT row pays a null slot per
    // left column in the shuffled unsafe row — while the native exec
    // shuffles each side at its own width
    val wideCols = (1 to 24).map(i => lit(s"payload_column_value_$i").as(s"p$i"))

    for (m <- scales) {
      val c = corpusAt(m).persist()
      val clicks = c.filter(col("event_type") === "click")
        .select(Seq(col("user_id"), col("event_id"), col("ts")) ++ wideCols: _*)
      val errors = c.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("err_id"), col("ts"))
      c.count() // materialize outside the timed region
      for (narrow <- Seq(true, false)) {
        val l = if (narrow) clicks.select("user_id", "event_id", "ts") else clicks
        val (nWin, tWin) = time(graft.ops.AsOfJoin.asOf(
          l, errors, "user_id", "ts", "ts", Seq("err_id")).count())
        val (nNat, tNat) = time(graft.ops.AsOfJoin.asOfNative(
          l, errors, "user_id", "ts", "ts", Seq("err_id")).count())
        require(nWin == nNat, s"row count mismatch at $m: $nWin vs $nNat")
        println(s"""{"scale":$m,"wide":${!narrow},"rows":$nWin,""" +
          s""""window_s":$tWin,"native_s":$tNat}""")
      }
      c.unpersist()
    }
    spark.stop()
  }
}
