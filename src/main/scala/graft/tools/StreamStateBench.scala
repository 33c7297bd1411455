package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the claim behind every watermarked streaming query in the
  * suite: state is bounded by the WATERMARK WINDOW, not by the stream's
  * length. The events table is replayed m× with shifted timestamps
  * (an m×-longer timeline of fresh keys), deduplicated two ways:
  *
  *   - `dropDuplicatesWithinWatermark` under a 1-hour watermark: the
  *     state store holds only keys newer than the watermark — final
  *     state size should stay FLAT as m grows;
  *   - plain `dropDuplicates` (no watermark): state holds every
  *     distinct key ever seen — final state size grows LINEARLY in m.
  *
  * Reports the state store's own numRowsTotal from the final
  * StreamingQueryProgress. Usage:
  * runMain graft.tools.StreamStateBench [sfDir] [scales]
  */
object StreamStateBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("1,4").split(",").map(_.trim.toInt)

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val evRaw = spark.read.parquet(s"$sfDir/events.parquet")
    val ev = graft.queries.EventTs.toNanos(evRaw)
    val (minNs, maxNs) = {
      val r = ev.agg(min("ts"), max("ts")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val spanNs = maxNs - minNs + 3600L * 1000000000L

    for (m <- scales) {
      val streamDir = java.nio.file.Files.createTempDirectory(s"ssb_$m")
      (0 until m).foreach { i =>
        val offNs = i.toLong * spanNs
        val shifted = evRaw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            evRaw.withColumn("ts", col("ts") + lit(offNs))
          case t => evRaw.withColumn("ts",
            timestamp_micros(unix_micros(col("ts").cast("timestamp")) +
              lit(offNs / 1000L)).cast(t))
        }
        // user ids shift too: each replay epoch brings FRESH keys, the
        // open-domain reality the watermark exists for
        shifted.withColumn("user_id", col("user_id") + lit(i * 1000000L))
          .write.mode("overwrite").parquet(streamDir.resolve(f"part_$i%02d").toString)
      }
      for (bounded <- Seq(true, false)) {
        val src = graft.queries.EventTs.toNanos(
          spark.readStream.schema(evRaw.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(streamDir.toString + "/part_*"))
          .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
          .withColumn("bucket_s", expr("ts div 3600000000000 * 3600"))
        val deduped =
          if (bounded)
            src.withWatermark("event_time", "1 hour")
              .dropDuplicatesWithinWatermark("user_id", "event_type", "bucket_s")
          else src.dropDuplicates("user_id", "event_type", "bucket_s")
        val name = "ssb_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = deduped.select("user_id", "event_type", "bucket_s")
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val stateRows = Option(q.lastProgress)
          .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
        val outRows = spark.table(name).count()
        println(s"""{"m":$m,"mode":"${if (bounded) "watermarked" else "unbounded"}",""" +
          s""""state_rows":$stateRows,"out_rows":$outRows}""")
      }
    }
    spark.stop()
  }
}
