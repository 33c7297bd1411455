package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Similarity

class CosineSimSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("cosine_sim registers via GraftExtensions and computes correctly") {
    assert(spark.catalog.functionExists("cosine_sim"))
    val r = spark.sql(
      "SELECT cosine_sim(array(1D, 0D), array(1D, 0D)) a," +
        " cosine_sim(array(1D, 0D), array(0D, 1D)) b," +
        " cosine_sim(array(1D, 2D, 3D), array(3D, 2D, 1D)) c").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 10.0 / 14.0) < 1e-12)
  }

  test("native expression matches the HOF formulation bit-for-bit") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .limit(100)
    val paired = df.as("a").crossJoin(df.as("b")).limit(500)
      .select(col("a.v").as("x"), col("b.v").as("y"))
    val hof = expr("aggregate(zip_with(x, y, (p, q) -> p * q), 0D, (acc, z) -> acc + z)" +
      " / (sqrt(aggregate(x, 0D, (acc, p) -> acc + p * p))" +
      " * sqrt(aggregate(y, 0D, (acc, q) -> acc + q * q)))")
    val rows = paired.select(expr("cosine_sim(x, y)").as("native"), hof.as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"${r.getDouble(0)} != ${r.getDouble(1)}"))
  }

  test("cosine_sim participates in whole-stage codegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"embedding".cast("array<double>").as("v"))
    val plan = df.select(expr("cosine_sim(v, v)")).queryExecution.executedPlan.toString()
    assert(plan.contains("*("), plan) // codegen span covers the projection
  }

  test("mismatched lengths and null elements yield NULL like the HOF path") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1D, 2D), array(1D)) a," +
        " cosine_sim(array(1D, cast(null as double)), array(1D, 2D)) b").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("type check rejects non-array args with a named error") {
    val e = intercept[Exception](spark.sql("SELECT cosine_sim(1, 2)").collect())
    assert(e.getMessage.contains("cosine_sim") || e.getMessage.contains("DATATYPE"),
      e.getMessage)
  }

  test("Similarity.bruteForceTopK picks the native function when registered") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.bruteForceTopK(embs, embs.filter($"vec_id" === 0),
      "vec_id", "embedding", 5)
    val plan = out.queryExecution.analyzed.toString()
    assert(plan.contains("cosine_sim"), plan.take(500))
    assert(out.count() == 5)
  }
}
