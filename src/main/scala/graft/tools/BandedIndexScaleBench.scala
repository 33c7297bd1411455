package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The honest-cost measurement for [[graft.streaming.BandedIndexProcessor]]
  * (the recall-1.0 streaming near-dup index, g124): stream n random
  * 64-bit signatures through the banded index and report
  *
  *   - final state KEYS (the store's numRowsTotal counts grouping
  *     keys, i.e. occupied band buckets): saturates at
  *     (k+1) x 2^(64/(k+1)) — 262,144 for k=3 — while the list
  *     ENTRIES inside them are exactly (k+1) x distinct signatures by
  *     construction (each distinct sig appends once per band; exact
  *     re-arrivals never append). Linear entry growth is the price of
  *     BEING an index (the recall side is tools/BandedRecallBench);
  *   - wall time and arrivals/s: per-arrival cost grows with bucket
  *     occupancy n/2^16 (each arrival scans its bucket's list), so the
  *     curve quantifies where 16-bit bands need more state-store
  *     partitions at 100 TB.
  *
  * Usage: runMain graft.tools.BandedIndexScaleBench [sizes]
  * (default 65536,262144,1048576). One JSON line per size; paste into
  * COVERAGE.md.
  */
object BandedIndexScaleBench {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("65536,262144,1048576")
      .split(",").map(_.trim.toLong).toSeq
    val maxHamming = 3
    val nBands = maxHamming + 1
    val bandBits = 64 / nBands
    val mask = (1L << bandBits) - 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    for (n <- sizes) {
      val all = spark.range(0, n).select(col("id"),
        (col("id") * 1000L).as("ts"), xxhash64(lit("sig"), col("id")).as("sig"))
      val streamDir = java.nio.file.Files.createTempDirectory(s"bisb_$n")
      Seq("a", "b", "c").zipWithIndex.foreach { case (sub, i) =>
        graft.streaming.StreamFiles.writeOne(
          all.filter(col("id") % 3 === i), streamDir, sub)
      }
      val name = s"bisb_sink_$n"
      val t0 = System.nanoTime()
      val q = spark.readStream.schema(all.schema)
        .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
        .select(col("id"), col("ts"), col("sig"),
          explode(graft.ops.Dedup.streamBandKeys(col("sig"), maxHamming))
            .as("bkey"))
        .select(col("bkey"), col("ts"), col("id"), col("sig"))
        .as[(Long, Long, Long, Long)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3, r._4))
        .transformWithState(new graft.streaming.BandedIndexProcessor(maxHamming),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Append(),
          implicitly[org.apache.spark.sql.Encoder[(Long, Long)]])
        .toDF("id", "cand")
        .groupBy(lit(1)).agg(count(lit(1)).as("rows"),
          sum(when(col("cand") >= 0, 1L).otherwise(0L)).as("matched"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val stateRows = q.recentProgress.flatMap(_.stateOperators)
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)
      spark.catalog.dropTempView(name)
      val occupancy = n.toDouble / (1L << bandBits)
      println(f"""{"tool":"BandedIndexScaleBench","n":$n,""" +
        f""""band_occupancy":$occupancy%.2f,"state_keys":$stateRows,""" +
        f""""state_entries":${(maxHamming + 1) * n},""" +
        f""""wall_s":$wall%.2f,"arrivals_per_s":${n / wall}%.0f}""")
      // clean the split dir (checkpoints are temp-dir scoped already)
      graft.streaming.StreamFiles.deleteTree(streamDir)
    }
    spark.stop()
  }
}
