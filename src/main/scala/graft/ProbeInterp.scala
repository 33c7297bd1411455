package graft

import org.apache.spark.sql.SparkSession

/** Transient perf probe: interpreter vs Catalyst fast path on the IoT
  * schema at probe scale. Not part of the driver contract.
  */
object ProbeInterp {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = SparkSession.builder()
      .withExtensions(new graft.expr.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val schema = graft.api.CannedSources.iotSchemaJson
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val walkOnly = """[
      {"name": "device-id", "class": "uuid"},
      {"class": "sequence", "lengthDistribution": 100,
       "base": {"class": "map", "value": [
         {"name": "temp", "class": "random-walk", "start": 30, "mean": 0, "sd": 1}]},
       "flat": true}
    ]"""
    val eventOnly = """[
      {"name": "device-id", "class": "uuid"},
      {"class": "sequence", "lengthDistribution": 100,
       "base": {"class": "map", "value": [
         {"name": "time", "class": "event", "format": "yyyy-MM-dd HH:mm:ss", "rate": "1/m"}]},
       "flat": true}
    ]"""
    val eventQ = """[
      {"name": "device-id", "class": "uuid"},
      {"class": "sequence", "lengthDistribution": 100,
       "base": {"class": "map", "value": [
         {"name": "time", "class": "event", "format": "Q", "rate": "1/m"}]},
       "flat": true}
    ]"""
    if (sys.env.contains("PROBE_EXPLAIN")) {
      graft.synth.Synth.dataFrameAuto(spark, walkOnly, n).explain("formatted")
      spark.stop(); return
    }
    // warm both paths
    graft.synth.Synth.dataFrame(spark, schema, 10000).write.format("noop").mode("overwrite").save()
    graft.synth.Synth.dataFrameAuto(spark, schema, 10000).write.format("noop").mode("overwrite").save()
    for (_ <- 1 to 2) {
      time("interp")(graft.synth.Synth.dataFrame(spark, schema, n)
        .write.format("noop").mode("overwrite").save())
      time("fast")(graft.synth.Synth.dataFrameAuto(spark, schema, n)
        .write.format("noop").mode("overwrite").save())
      time("fast-walk")(graft.synth.Synth.dataFrameAuto(spark, walkOnly, n)
        .write.format("noop").mode("overwrite").save())
      time("fast-event")(graft.synth.Synth.dataFrameAuto(spark, eventOnly, n)
        .write.format("noop").mode("overwrite").save())
      time("fast-eventQ")(graft.synth.Synth.dataFrameAuto(spark, eventQ, n)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
