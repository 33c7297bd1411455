package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Sessionize

/** Drives the flatMapGroupsWithState sessionizer with a MemoryStream:
  * sessions split on gaps inside a batch and survive across batches.
  */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  test("sessionizer splits on gap inside a batch and carries state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (key, epochSeconds)
    val events = input.toDF()
      .select(col("_1").as("key"), col("_2").cast("timestamp").as("event_time"))
    val out = Sessionize.sessions(events, gapSeconds = 60)
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // batch 1: key 1 has two bursts separated by >60s -> first closes
      input.addData((1L, 1000L), (1L, 1010L), (1L, 2000L), (2L, 1000L))
      q.processAllAvailable()
      val closed1 = spark.sql("select * from sess where closed and key = 1")
        .as[Sessionize.Session].collect()
      assert(closed1.length == 1)
      assert(closed1(0).startMs == 1000000 &&
        closed1(0).endMs == 1010000 && closed1(0).nEvents == 2)
      // batch 2: key 1's open session (started 2000) continues
      input.addData((1L, 2030L), (1L, 2090L), (1L, 3000L))
      q.processAllAvailable()
      val closed2 = spark.sql("select * from sess where closed and startMs = 2000000")
        .as[Sessionize.Session].collect()
      assert(closed2.length == 1)
      assert(closed2(0).nEvents == 3 && closed2(0).endMs == 2090000)
      // batch 3: advance the watermark far past key 2's horizon -> its
      // idle session times out and closes
      input.addData((9L, 4000L))
      q.processAllAvailable()
      input.addData((9L, 5000L))
      q.processAllAvailable()
      val closedK2 = spark.sql("select * from sess where closed and key = 2")
        .as[Sessionize.Session].collect()
      assert(closedK2.length == 1 && closedK2(0).nEvents == 1)
    } finally q.stop()
  }
}
