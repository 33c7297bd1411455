package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Bucketing, Skew}

/** Scale-primitive tests: salted aggregation/join equivalence, and
  * shuffle-free joins over bucketed tables.
  */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("int8 quantization: codes in range, reconstruction within half a step") {
    import graft.ops.Quantization
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 200L).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))) :+ (0L, Array.fill(16)(0f))
    val df = vecs.toDF("vec_id", "embedding")
    val qz = Quantization.quantize(df, "vec_id", "embedding").collect()
    qz.foreach { r =>
      val codes = r.getSeq[Long](1)
      val m = r.getLong(2) / 1e6
      assert(codes.forall(q => q >= -127 && q <= 127), s"code out of range: $codes")
      if (m == 0d) assert(codes.forall(_ == 0L))
    }
    // dequantized value is within half a quantization step of the input
    // (plus the micro-unit rounding of the scale itself)
    val orig = vecs.map { case (id, v) => id -> v }.toMap
    qz.filter(_.getLong(2) > 0).foreach { r =>
      val id = r.getLong(0); val codes = r.getSeq[Long](1); val m = r.getLong(2) / 1e6
      val step = m / 127d
      codes.zip(orig(id)).foreach { case (q, x) =>
        assert(math.abs(q * step - x) <= step / 2 + 1e-6,
          s"vec $id: |${q * step} - $x| > ${step / 2}")
      }
    }
  }

  test("int8 integer-dot ANN recalls the exact cosine top-k on real embeddings") {
    import graft.ops.{Quantization, Similarity}
    // the real 64-dim corpus: realistic neighbor separation. (A synthetic
    // tight-cluster corpus puts dozens of near-tied candidates at the
    // top-10 boundary and int8 resolution genuinely cannot split those —
    // recall@10 there sits near 0.45 by construction, not by bug.)
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = df.filter(col("vec_id") % 50 === 0)
    def topSets(res: org.apache.spark.sql.DataFrame) = res
      .collect().map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 10)
      .select(col("qid"), col("rnk").cast("long"), col("neighbor")))
    val quant = topSets(Quantization.int8TopK(df, queries, "vec_id", "embedding", 10)
      .select(col("qid"), col("rnk"), col("neighbor")))
    assert(exact.keySet == quant.keySet)
    // keys is a Set — map through a Seq or identical per-query recalls
    // dedupe and the average collapses
    val recall = exact.keys.toSeq.map(q =>
      (exact(q) intersect quant(q)).size.toDouble / 10).sum / exact.size
    assert(recall >= 0.8, s"recall@10 $recall < 0.8")
  }

  test("salted aggregation equals direct aggregation on a skewed key") {
    // 90% of rows share one key — the classic hot-key shape
    val df = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong else 7L, i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(df, "k", salts = 8,
      "cnt" -> count(lit(1)), "total" -> sum("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted join equals plain join and spreads the hot key") {
    val big = (1 to 5000).map(i => (if (i % 20 == 0) i.toLong % 5 else 1L, i.toLong))
      .toDF("k", "v")
    val small = (0L to 5L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, "k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(big, small, "k", salts = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
  }

  test("bucketed tables join with no Exchange on either side") {
    val a = (1 to 1000).map(i => (i.toLong, i * 2L)).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 3L)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bkt_a", "k", 4)
    Bucketing.writeBucketed(b, "bkt_b", "k", 4)
    // force the large-table path: tiny test tables would otherwise take a
    // broadcast join and the planner disables bucketing entirely
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cogroupJoin(spark, "bkt_a", "bkt_b", "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        plan) // scans satisfy the join's distribution: shuffle-free
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
