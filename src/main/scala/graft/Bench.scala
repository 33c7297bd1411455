package graft

import org.apache.spark.sql.SparkSession

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
    // estimator for a deterministic workload.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
