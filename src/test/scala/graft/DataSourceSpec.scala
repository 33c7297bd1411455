package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.synth.Synth

/** DataSource V2 face of the generator: equivalence with the
  * mapPartitions path, pushdown, and pruning.
  */
class DataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  private val schema = """[
    {"name": "device-id", "class": "uuid"},
    {"name": "ip", "class": "ipv4"},
    {"name": "n", "class": "int", "min": 0, "max": 1000}
  ]"""

  private def read(n: Long, partitions: Int) =
    spark.read.format("graft")
      .option("schema", schema)
      .option("n", n.toString)
      .option("seed", "42")
      .option("partitions", partitions.toString)
      .load()

  test("graft format reads n rows and is bit-identical to Synth.dataFrame") {
    val viaSource = read(5000, 4).collect().map(_.toString).sorted
    val viaSynth = Synth.dataFrame(spark, schema, 5000, seed = 42, partitions = 4)
      .collect().map(_.toString).sorted
    assert(viaSource.length == 5000)
    assert(viaSource.toSeq == viaSynth.toSeq,
      "V2 source must reproduce the mapPartitions path bit-for-bit")
  }

  test("column pruning reaches the scan (ReadSchema narrows)") {
    val pruned = read(1000, 2).select("ip")
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("cols=ip") || plan.contains("ReadSchema: struct<ip:string>"),
      s"scan should read only ip:\n$plan")
    assert(pruned.collect().forall(_.getString(0).matches("^\\d{1,3}(\\.\\d{1,3}){3}$")))
    // empty projection (count) still produces row cadence
    assert(read(1234, 3).count() == 1234)
  }

  test("K/M size suffixes and defaults work") {
    val df = spark.read.format("graft")
      .option("schema", """[{"name": "x", "class": "int", "min": 0, "max": 9}]""")
      .option("n", "2K")
      .load()
    assert(df.count() == 2000)
  }

  test("SQL table function synth() generates through the same lowering") {
    val viaSql = spark.sql(
      s"SELECT * FROM synth('${schema.replace("\n", " ")}', 500)")
    assert(viaSql.columns.toSeq == Seq("device-id", "ip", "n"))
    assert(viaSql.count() == 500)
    // explicit seed: deterministic and seed-sensitive
    val a = spark.sql("SELECT * FROM synth('[{\"name\": \"x\", \"class\": \"int\", \"min\": 0, \"max\": 100}]', 100, 7)")
      .collect().map(_.getLong(0)).toSeq
    val b = spark.sql("SELECT * FROM synth('[{\"name\": \"x\", \"class\": \"int\", \"min\": 0, \"max\": 100}]', 100, 7)")
      .collect().map(_.getLong(0)).toSeq
    val c = spark.sql("SELECT * FROM synth('[{\"name\": \"x\", \"class\": \"int\", \"min\": 0, \"max\": 100}]', 100, 8)")
      .collect().map(_.getLong(0)).toSeq
    assert(a == b && a != c)
    // composes with ordinary SQL (aggregate over a generated table)
    val agg = spark.sql(
      "SELECT count(*) AS c, min(x) AS lo, max(x) AS hi FROM " +
        "synth('[{\"name\": \"x\", \"class\": \"int\", \"min\": 10, \"max\": 20}]', 1000)")
      .collect()(0)
    assert(agg.getLong(0) == 1000 && agg.getLong(1) >= 10 && agg.getLong(2) < 20)
  }

  test("graft readStream emits all n rows across micro-batches, batch-size-independent") {
    def run(rowsPerBatch: Int): Seq[String] = {
      val name = s"graft_stream_$rowsPerBatch"
      val q = spark.readStream.format("graft")
        .option("schema", schema)
        .option("n", "2500")
        .option("seed", "42")
        .option("rowsPerBatch", rowsPerBatch.toString)
        .load()
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        q.processAllAvailable()
        spark.sql(s"select * from $name").collect().map(_.toString).sorted.toSeq
      } finally q.stop()
    }
    val small = run(300) // 9 batches
    val big = run(5000) // 1 batch
    assert(small.length == 2500)
    // per-row keyed RNG: records identical no matter where batch
    // boundaries fall
    assert(small == big)
  }

  test("missing schema option fails loudly") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").load().collect()
    }
    assert(e.getMessage.contains("schema"))
  }
}
