package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.WarcIo

class WarcStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  /** n segment files named to sort in write order, k records each. */
  private def writeSegments(dir: String, n: Int, perFile: Int): Unit = {
    for (f <- 0 until n) {
      val fos = new WarcIo.CountingOutputStream(
        new java.io.FileOutputStream(f"$dir/seg-$f%03d.warc.gz"))
      val cdx = new java.lang.StringBuilder()
      try (0 until perFile).foreach { i =>
        val id = f * perFile + i
        val off = fos.count
        WarcIo.writeRecordGzip(fos, "resource", s"urn:s:$id",
          "2026-03-01T00:00:00Z", s"https://x.example.com/$id",
          "text/plain", s"payload-$id".getBytes("UTF-8"))
        cdx.append(off).append('\t').append(fos.count - off).append('\n')
      } finally fos.close()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(f"$dir/seg-$f%03d.warc.gz.cdx"), cdx.toString)
    }
  }

  private def runStream(dir: String, filesPerBatch: Int): (Seq[String], Int) = {
    val name = s"warc_stream_${filesPerBatch}_" +
      java.util.UUID.randomUUID.toString.take(8)
    val q = spark.readStream.format("warc")
      .option("filesPerBatch", filesPerBatch.toString)
      .load(dir)
      .select("record_id")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table(name).as[String].collect().sorted.toSeq
      val batches = q.recentProgress.count(_.numInputRows > 0)
      (rows, batches)
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("micro-batch ingestion is batch-layout independent and actually batches") {
    val dir = java.nio.file.Files.createTempDirectory("warcstream1").toString
    writeSegments(dir, 6, 5)
    val (one, batchesOne) = runStream(dir, 1)
    val (all, batchesAll) = runStream(dir, 100)
    assert(one.length == 30 && one == all)
    assert(batchesOne == 6, s"expected 6 single-file batches, got $batchesOne")
    assert(batchesAll == 1)
  }

  test("new segments appearing mid-stream are picked up in later batches") {
    val dir = java.nio.file.Files.createTempDirectory("warcstream2").toString
    writeSegments(dir, 2, 3)
    val name = "warc_stream_grow_" + java.util.UUID.randomUUID.toString.take(8)
    val q = spark.readStream.format("warc").option("filesPerBatch", "1")
      .load(dir).select("record_id")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == 6)
      // a third segment lands (sorts after — the archive convention)
      val fos = new WarcIo.CountingOutputStream(
        new java.io.FileOutputStream(s"$dir/seg-900.warc.gz"))
      try WarcIo.writeRecordGzip(fos, "resource", "urn:s:late",
        "2026-03-01T00:00:00Z", "https://x.example.com/late",
        "text/plain", "late".getBytes("UTF-8"))
      finally fos.close()
      q.processAllAvailable()
      assert(spark.table(name).count() == 7)
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("a segment sorting into committed history fails loudly, not silently") {
    val dir = java.nio.file.Files.createTempDirectory("warcstream3").toString
    writeSegments(dir, 3, 2)
    val name = "warc_stream_mut_" + java.util.UUID.randomUUID.toString.take(8)
    val q = spark.readStream.format("warc").option("filesPerBatch", "10")
      .load(dir).select("record_id")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == 6)
      // a file that sorts BEFORE the ingested prefix shifts every index
      val fos = new java.io.FileOutputStream(s"$dir/aaa-000.warc.gz")
      try {
        val gz = new java.util.zip.GZIPOutputStream(fos)
        WarcIo.writeRecord(gz, "resource", "urn:s:bad", "2026-03-01T00:00:00Z",
          null, "text/plain", "bad".getBytes("UTF-8"))
        gz.finish()
      } finally fos.close()
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(Option(e.getMessage).getOrElse("").contains("mutated") ||
        e.getCause != null)
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }
}
