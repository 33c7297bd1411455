package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Evidence for the r14 changelog-checkpointing adoption (r14 verdict
  * "next round" item 7): at bench SFs the state is kilobytes and the
  * changelog flag is wall-neutral, so this rig scales STATE SIZE
  * instead — the events table replayed m× with shifted keys/timestamps
  * streams through a RocksDB `dropDuplicates` seen-set one file per
  * micro-batch, so by the last batch the store holds m× the bench's
  * key count. With changelog checkpointing ON a commit appends the
  * batch's delta (cost ∝ delta, flat in m); OFF uploads a full RocksDB
  * snapshot per store per commit (cost ∝ total state, grows with m).
  *
  * Prints one JSON line per (m, changelog) cell: the per-batch commit
  * times (summed across partitions, ms) of the LAST data batch — the
  * batch where total state is largest and the two modes diverge — plus
  * the first/median batch for the curve.
  *
  * Usage: runMain graft.tools.RocksDbCommitBench [sfDir] [scales]
  */
object RocksDbCommitBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("1,4,16").split(",").map(_.trim.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // per-batch (commitMs summed across partitions, state rows) in
    // arrival order, refreshed per query by the listener
    val commits = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        // pick the dedup seen-set (largest store), not a downstream agg
        p.stateOperators.sortBy(-_.numRowsTotal).headOption.foreach { s =>
          commits.synchronized {
            commits += ((p.batchId, s.commitTimeMs, s.numRowsTotal))
          }
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    val evRaw = spark.read.parquet(s"$sfDir/events.parquet")
    for (m <- scales) {
      // m shifted replays, one file each = one micro-batch each; fresh
      // keys per replay so the seen-set grows by ~|events| keys a batch
      val streamDir = java.nio.file.Files.createTempDirectory(f"rcb_$m%02d")
      (0 until m).foreach { i =>
        evRaw.select(
            (col("event_id") + lit(i * 10000000L)).as("k"),
            // fat dedup key: state bytes scale with rows × ~260 B, so
            // total-state-size effects (snapshot upload, compaction)
            // are visible at small m
            concat_ws("", (0 until 8).map(_ => md5(col("event_id").cast("string"))): _*).as("pad"))
          .repartition(1)
          .write.mode("overwrite")
          .parquet(streamDir.resolve(f"part_$i%02d").toString)
      }
      for (changelog <- Seq(true, false)) {
        spark.conf.set(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
          changelog.toString)
        commits.synchronized(commits.clear())
        val name = "rcb_" + java.util.UUID.randomUUID.toString.replace("-", "")
        val q = spark.readStream
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("pad",
              org.apache.spark.sql.types.StringType))))
          .option("maxFilesPerTrigger", "1")
          .parquet(streamDir.toString + "/part_*")
          .dropDuplicates("k", "pad")
          .select(col("k"))
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        spark.catalog.dropTempView(name)
        val snap = commits.synchronized(commits.sortBy(_._1).toVector)
        val cms = snap.map(_._2)
        def fmt(v: Seq[Long]) = v.mkString("[", ",", "]")
        println(
          s"""{"metric":"rocksdb_commit","m":$m,"changelog":$changelog,""" +
            s""""batches":${cms.size},"commit_ms_per_batch":${fmt(cms)},""" +
            s""""state_rows_final":${snap.lastOption.map(_._3).getOrElse(0L)},""" +
            s""""commit_ms_first":${cms.headOption.getOrElse(0L)},""" +
            s""""commit_ms_last":${cms.lastOption.getOrElse(0L)}}""")
      }
      graft.streaming.StreamFiles.deleteTree(streamDir)
    }
    spark.stop()
    sys.exit(0)
  }
}
