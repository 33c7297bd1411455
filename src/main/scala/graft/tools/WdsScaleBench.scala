package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the `wds` streaming tar source (r11 verdict ask
  * #3 "done" criterion: a multi-hundred-MB shard ingested with FLAT
  * task memory). Two measurements:
  *
  * 1. **Framer memory probe** (no Spark): stream a synthetic shard of
  *    `sizeMb` MB through [[graft.sources.TarIo.members]] directly
  *    from a generator InputStream — no file, no row batching — and
  *    record the max post-GC-estimate heap delta across the walk.
  *    The old whole-shard seam holds `size + copies` bytes; the
  *    streaming framer must hold ONE member regardless of shard size.
  *
  * 2. **Spark ingest curve**: write real shards at 1x/2x/4x total
  *    bytes through the `wds` sink, then time (a) a full
  *    payload-reading scan and (b) a metadata-only scan (payload
  *    pruned at the framer — skip, not allocate). Per-byte cost must
  *    stay flat; the pruned scan must beat the full scan wall-clock.
  *
  * Usage: runMain graft.tools.WdsScaleBench [shardMb] [curveMb]
  * (defaults 384 and 64,128,256). One JSON line per measurement.
  */
object WdsScaleBench {

  /** Endless tar bytes: members of `memberKb` KB until `totalBytes`,
    * then trailer — generated on the fly so the probe's own input
    * never occupies memory.
    */
  private final class TarGen(totalBytes: Long, memberKb: Int)
      extends java.io.InputStream {
    private var buf: Array[Byte] = Array.emptyByteArray
    private var pos = 0
    private var emitted = 0L
    private var member = 0
    private var trailerSent = false
    private val payload = Array.fill[Byte](memberKb * 1024)('x'.toByte)

    private def refill(): Boolean = {
      if (emitted < totalBytes) {
        val bos = new java.io.ByteArrayOutputStream()
        graft.sources.TarIo.writeMember(bos, f"m$member%08d.bin", payload)
        member += 1
        buf = bos.toByteArray
        emitted += buf.length
        pos = 0
        true
      } else if (!trailerSent) {
        val bos = new java.io.ByteArrayOutputStream()
        graft.sources.TarIo.writeTrailer(bos)
        buf = bos.toByteArray
        pos = 0
        trailerSent = true
        true
      } else false
    }

    override def read(): Int = {
      if (pos >= buf.length && !refill()) return -1
      val b = buf(pos) & 0xff; pos += 1; b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= buf.length && !refill()) return -1
      val k = math.min(len, buf.length - pos)
      System.arraycopy(buf, pos, b, off, k); pos += k; k
    }
  }

  private def usedHeap(): Long = {
    val rt = Runtime.getRuntime
    rt.totalMemory() - rt.freeMemory()
  }

  def main(args: Array[String]): Unit = {
    val shardMb = args.headOption.map(_.toInt).getOrElse(384)
    val curveMb = args.lift(1).getOrElse("64,128,256")
      .split(",").map(_.trim.toInt).toSeq

    // --- 1. framer memory probe, pure JVM ---------------------------
    System.gc(); Thread.sleep(200)
    val base = usedHeap()
    var maxDelta = 0L
    var members = 0L
    var bytes = 0L
    val it = graft.sources.TarIo.members(
      new java.io.BufferedInputStream(
        new TarGen(shardMb.toLong * 1024 * 1024, 256), 1 << 16))
    while (it.hasNext) {
      val m = it.next()
      members += 1
      bytes += m.size
      if (members % 256 == 0) {
        System.gc() // measure LIVE bytes, not young-gen garbage
        val d = usedHeap() - base
        if (d > maxDelta) maxDelta = d
      }
    }
    println(s"""{"metric":"wds_framer_memory","shard_mb":$shardMb,""" +
      s""""members":$members,"payload_mb":${bytes / 1024 / 1024},""" +
      s""""max_heap_delta_mb":${maxDelta / 1024 / 1024}}""")

    // --- 2. Spark ingest curve --------------------------------------
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.expr.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for (mb <- curveMb) {
      val dir = java.nio.file.Files.createTempDirectory(s"wds_bench_$mb").toString
      val nSamples = mb * 4 // 256 KB per sample
      spark.range(nSamples.toLong).select(
          concat(lit("s"), lpad($"id".cast("string"), 8, "0")).as("key"),
          lit("bin").as("ext"),
          // deterministic 256 KB payload without Random
          repeat(concat(lit("x"), lpad(pmod($"id", lit(97L)).cast("string"), 3, "0")),
            65536).cast("binary").as("payload"))
        .write.format("wds").mode("overwrite")
        .option("path", dir).option("targetShardBytes", (64L * 1024 * 1024).toString)
        .save()

      def time[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime()
        val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (full, tFull) = time {
        spark.read.format("wds").load(dir)
          .agg(count(lit(1)), sum(length($"payload"))).collect()(0)
      }
      val (meta, tMeta) = time {
        spark.read.format("wds").load(dir)
          .agg(count(lit(1)), sum($"size")).collect()(0)
      }
      require(full.getLong(0) == meta.getLong(0) && full.getLong(1) == meta.getLong(1),
        s"full/meta disagree: $full vs $meta")
      println(f"""{"metric":"wds_ingest","total_mb":$mb,"samples":$nSamples,""" +
        f""""full_scan_s":$tFull%.2f,"meta_scan_s":$tMeta%.2f,""" +
        f""""full_mb_per_s":${mb / tFull}%.1f}""")
      // clean up the bench shards
      graft.sources.ArchiveFs.delete(dir, recursive = true)
    }

    // --- 3. intra-shard parallelism: ranged idx splits vs one task --
    // one LARGE shard (the shape a repack job emits), scanned as a
    // single whole-file partition vs ~32 ranged splits cut at the
    // sidecar's sample boundaries
    locally {
      val mb = curveMb.max * 2
      val dir = java.nio.file.Files.createTempDirectory("wds_bench_big").toString
      spark.range(mb.toLong * 4).select(
          concat(lit("s"), lpad($"id".cast("string"), 8, "0")).as("key"),
          lit("bin").as("ext"),
          repeat(concat(lit("x"), lpad(pmod($"id", lit(97L)).cast("string"), 3, "0")),
            65536).cast("binary").as("payload"))
        .coalesce(1) // ONE writer -> ONE shard
        .write.format("wds").mode("overwrite")
        .option("path", dir).option("targetShardBytes", (1L << 40).toString)
        .save()
      def time[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime()
        val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      def scan(splitBytes: Long) = {
        val src = spark.read.format("wds")
          .option("splitTargetBytes", splitBytes.toString).load(dir)
        // partition count of the SCAN, not the 1-partition aggregate;
        // md5 per member makes the job compute-real (the fingerprint
        // work a dedup/repack pass actually does per payload)
        val parts = src.rdd.getNumPartitions
        (parts, src.agg(count(lit(1)), sum(length($"payload")),
          max(md5($"payload"))).collect()(0))
      }
      val ((pWhole, rWhole), tWhole) = time(scan(1L << 40))
      val ((pSplit, rSplit), tSplit) = time(scan(mb.toLong * 1024 * 1024 / 32))
      require(rWhole == rSplit, s"split/whole disagree: $rWhole vs $rSplit")
      println(f"""{"metric":"wds_ranged_split","shard_mb":$mb,""" +
        f""""whole_parts":$pWhole,"whole_s":$tWhole%.2f,""" +
        f""""split_parts":$pSplit,"split_s":$tSplit%.2f,""" +
        f""""speedup":${tWhole / tSplit}%.1f}""")
      graft.sources.ArchiveFs.delete(dir, recursive = true)
    }
    spark.stop()
  }
}
