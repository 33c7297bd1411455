package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured proof for incremental index maintenance
  * ([[graft.ops.Quantization.appendToHashIvfIndex]]): at corpus scale
  * m, compare the cost of a FULL index rebuild over m+1 replicas
  * against APPENDING the one new replica onto an existing m-replica
  * index, then verify the two indexes serve identically on a sample
  * query set. The claim this demonstrates: append cost tracks the
  * DELTA size, not the corpus size — at 100 TB, adding a day's crawl
  * costs a day's crawl, not a corpus re-cluster.
  *
  * Usage: runMain graft.tools.IndexAppendBench [sfDir] [scales]
  * (defaults /root/testdata/sf0.1 and 1,4,10). One JSON line per
  * scale; paste into COVERAGE.md.
  */
object IndexAppendBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("1,4,10").split(",").map(_.trim.toInt).toSeq
    require(scales.forall(_ >= 1), s"scales must be >= 1: $scales")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.expr.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

    // the AnnScaleBench replica transform: sign-flip odd coordinates and
    // roll by r — orthogonal, so replicas are new vectors with the same
    // geometry, and every run is deterministic
    def replica(r: Int): DataFrame =
      if (r == 0) base
      else base.select(
        (col("vec_id") + lit(r.toLong * 1000000L)).as("vec_id"),
        transform(sequence(lit(0), size(col("embedding")) - 1), i =>
          element_at(col("embedding"),
            (i + lit(r)) % size(col("embedding")) + 1) *
            when(i % 2 === 1, lit(-1d)).otherwise(lit(1d))).as("embedding"))

    def corpusAt(m: Int): DataFrame =
      (0 until m).map(replica).reduce(_ unionByName _)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    import graft.ops.Quantization
    val k = 8
    // untimed warmup so the first timed write doesn't absorb JVM/codegen
    // startup
    locally {
      val w = java.nio.file.Files.createTempDirectory("iab_warm").toString
      Quantization.writeHashIvfIndex(base, "vec_id", "embedding", w, k)
    }
    scales.foreach { m =>
      val corpus = corpusAt(m).localCheckpoint()
      val delta = replica(m).localCheckpoint()
      val n = corpus.count(); val dn = delta.count()

      val rebuildDir = java.nio.file.Files.createTempDirectory(s"iab_rb_$m").toString
      val tRebuild = time {
        Quantization.writeHashIvfIndex(
          corpus.unionByName(delta), "vec_id", "embedding", rebuildDir, k)
      }
      val appendDir = java.nio.file.Files.createTempDirectory(s"iab_ap_$m").toString
      Quantization.writeHashIvfIndex(corpus, "vec_id", "embedding", appendDir, k)
      val tAppend = time {
        Quantization.appendToHashIvfIndex(delta, "vec_id", "embedding", appendDir, k)
      }
      // serve-equality spot check on a sample query set
      val queries = base.filter(col("vec_id") % 997 === 0)
      def serve(dir: String) = Quantization.hashIvfTopKFromIndex(
        dir, queries, "vec_id", "embedding", 10, numClusters = k, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val equal = serve(appendDir) == serve(rebuildDir)
      println(s"""{"metric":"index_append","scale":$m,"corpus_rows":$n,""" +
        s""""delta_rows":$dn,"rebuild_s":${f"$tRebuild%.2f"},""" +
        s""""append_s":${f"$tAppend%.2f"},"serve_equal":$equal}""")
      require(equal, s"appended index diverged at scale $m")
    }
    spark.stop()
  }
}
