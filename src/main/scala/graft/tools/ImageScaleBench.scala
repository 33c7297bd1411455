package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}

/** Scale-curve experiment for the image family: grow the PNG corpus m×
  * (fresh hash-derived images per replica, plus the q141-style planted
  * brightness-shift duplicates at a fixed 10% rate) and measure
  *
  *   - dHash DECODE throughput (images/s): the mapPartitions scan is
  *     embarrassingly parallel, so per-image cost must stay flat as the
  *     corpus grows — at 100 TB this is the claim that executor count
  *     is the only knob;
  *   - banding candidate growth at maxHamming=0: candidates must track
  *     the TRUE duplicate structure (~linear, 10% of corpus), never the
  *     all-pairs square;
  *   - resize throughput (images/s) for the 36x32 -> 9x8 path.
  *
  * Usage: runMain graft.tools.ImageScaleBench [sfDir] [scales]
  * (defaults: /root/testdata/sf0.1 and 1,4). Output: one JSON line per
  * measurement; paste the table into COVERAGE.md.
  */
object ImageScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("1,4").split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDocs0 = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val pngSchema = StructType(Seq(StructField("id", LongType),
      StructField("png", BinaryType)))

    def corpus(m: Int, big: Boolean): org.apache.spark.sql.DataFrame = {
      val n = nDocs0 * m
      val ids = spark.range(0, n)
        .select(col("id").as("base_id"), col("id").as("id"), lit(0).as("shift"))
        .unionAll(spark.range(0, n).filter(col("id") % 10 === 0)
          .select(col("id").as("base_id"), (col("id") + 100000000L).as("id"),
            lit(3).as("shift")))
        .repartition(cpus.toInt)
      implicit val enc = org.apache.spark.sql.Encoders.row(pngSchema)
      ids.mapPartitions { rows =>
        rows.map { r =>
          val (baseId, id, shift) = (r.getLong(0), r.getLong(1), r.getInt(2))
          val png =
            if (!big) graft.ops.ImageDedup.grayPng(
              Array.tabulate(72)(i => (Math.floorMod(
                graft.runtime.Rng.mix(baseId * 72 + i), 201L) + shift).toInt), 9, 8)
            else graft.ops.ImageDedup.grayPng(
              Array.tabulate(36 * 32)(i => (Math.floorMod(
                graft.runtime.Rng.mix(baseId * 1152 + i), 201L) + shift).toInt),
              36, 32)
          Row(id, png)
        }
      }
    }

    for (m <- scales) {
      // decode+hash throughput on grid-sized PNGs
      val c = corpus(m, big = false).persist()
      val nImgs = c.count() // materialize the encode OUTSIDE the timing
      var t0 = System.nanoTime()
      val hashed = graft.ops.ImageDedup.dHash(c, "png")
        .select(col("id"), col("png_dhash").as("h")).localCheckpoint(true)
      val nHashed = hashed.count()
      val tHash = (System.nanoTime() - t0) / 1e9
      // banding candidates at the exact-match setting
      t0 = System.nanoTime()
      val pairs = graft.ops.Dedup.bandedHammingPairs(hashed, "id", "h", 0).count()
      val tPairs = (System.nanoTime() - t0) / 1e9
      c.unpersist()
      // resize throughput on 36x32 PNGs
      val b = corpus(m, big = true).persist()
      b.count()
      t0 = System.nanoTime()
      val resized = graft.ops.Multimodal.resizeImages(b, "png", 9, 8)
        .filter(col("png_resized").isNotNull).count()
      val tResize = (System.nanoTime() - t0) / 1e9
      b.unpersist()
      println(f"""{"tool":"ImageScaleBench","scale":$m,"images":$nImgs,""" +
        f""""hash_s":$tHash%.2f,"hash_imgs_per_s":${nHashed / tHash}%.0f,""" +
        f""""pairs":$pairs,"pairs_s":$tPairs%.2f,""" +
        f""""resize_imgs_per_s":${resized / tResize}%.0f}""")
    }
    spark.stop()
  }
}
