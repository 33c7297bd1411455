package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{IncrementalAgg, Sketches}

/** Incremental aggregate maintenance: merge(summarize(A), summarize(B))
  * must equal summarize(A ∪ B) for every component — the algebraic
  * counters exactly, the KMV sketch by its union closure.
  */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def rows(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, rnd.nextInt(40).toLong)
    }
  }

  test("merge of slice summaries equals the one-shot summary, exact sketch regime") {
    val a = rows(1, 300).toDF("key", "v", "u")
    val b = rows(2, 200).toDF("key", "v", "u")
    // b gets an extra key absent from a, and vice versa (one-sided keys)
    val a2 = a.union(Seq(("only_a", 7L, 1L)).toDF("key", "v", "u"))
    val b2 = b.union(Seq(("only_b", 9L, 2L)).toDF("key", "v", "u"))
    val k = 256
    val merged = IncrementalAgg.merge(
      IncrementalAgg.summarize(a2, Seq("key"), col("v"), col("u"), k),
      IncrementalAgg.summarize(b2, Seq("key"), col("v"), col("u"), k),
      Seq("key"), k)
    val direct = IncrementalAgg.summarize(
      a2.union(b2), Seq("key"), col("v"), col("u"), k)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("key"), col("n"), col("sum_v"), col("min_v"), col("max_v"),
        col("kmv")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getSeq[Long](5).toSeq)).sortBy(_._1).toSeq
    assert(canon(merged) == canon(direct))
  }

  test("merge closure holds in the APPROXIMATE regime too (k below distinct count)") {
    val a = (0 until 500).map(i => ("g", i.toLong, (i * 7 % 400).toLong))
      .toDF("key", "v", "u")
    val b = (0 until 500).map(i => ("g", i.toLong, (i * 11 % 390 + 200).toLong))
      .toDF("key", "v", "u")
    val k = 32 // far below the ~500 distinct users
    val merged = IncrementalAgg.merge(
      IncrementalAgg.summarize(a, Seq("key"), col("v"), col("u"), k),
      IncrementalAgg.summarize(b, Seq("key"), col("v"), col("u"), k),
      Seq("key"), k)
    val direct = IncrementalAgg.summarize(
      a.union(b), Seq("key"), col("v"), col("u"), k)
    val m = merged.select("kmv").collect().head.getSeq[Long](0).toSeq
    val d = direct.select("kmv").collect().head.getSeq[Long](0).toSeq
    assert(m == d) // KMV closure: union of sketches IS the sketch of the union
    // and the estimator lands within 30% of truth at k=32
    val est = merged.select(Sketches.kmvEstimate(col("kmv"), k)).collect().head.getLong(0)
    val truth = a.union(b).select(countDistinct("u")).collect().head.getLong(0)
    assert(math.abs(est - truth).toDouble / truth < 0.3, s"est=$est truth=$truth")
  }
}
