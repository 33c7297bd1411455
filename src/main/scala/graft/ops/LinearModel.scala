package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass linear-model training over integer feature vectors — the
  * quality-classifier fit of a curation pipeline (fastText-style:
  * hashed bag-of-words in, linear scorer out), structured so the ONLY
  * distributed work is the normal-equations aggregation: G = XᵀX and
  * b = Xᵀy are exact BIGINT sums over the integer features
  * ([[TextAnalysis.featureHash]] output), map-side combinable, and the
  * shuffle carries d(d+1) longs per partition REGARDLESS of corpus
  * size. The d×d ridge solve is driver-side post-processing on the
  * collected matrix — the same distributed/driver split as [[Pca]]
  * (Gram distributed, eigensolve driver) and the reason this training
  * pass survives 100 TB where SGD-style per-row updates cannot be
  * expressed as a Spark aggregation at all.
  */
object LinearModel {

  /** The distributed pass: rows (i, j, s) with j in [0, d) carrying
    * G_ij = Σ x_i·x_j and j = −1 carrying b_i = Σ x_i·y. All integer —
    * a pure function of the (features, label) multiset, exactly
    * replayable in SQL (the q95 oracle). The feature array is staged
    * as an attribute before the product fan-out (lambda-CSE staging
    * rule).
    */
  def normalEquations(df: DataFrame, featuresCol: String,
      labelCol: String): DataFrame = {
    val staged = df.select(col(featuresCol).as("__x"),
      col(labelCol).cast("long").as("__y"))
    val g = staged
      .select(posexplode(transform(col("__x"),
        xi => transform(col("__x"), xj => xi * xj))).as(Seq("i", "__prods")))
      .select(col("i").cast("long").as("i"),
        posexplode(col("__prods")).as(Seq("j", "__p")))
      .groupBy(col("i"), col("j").cast("long").as("j"))
      .agg(sum(col("__p")).as("s"))
    val b = staged
      .select(posexplode(col("__x")).as(Seq("i", "__xi")), col("__y"))
      .groupBy(col("i").cast("long").as("i"))
      .agg(sum(col("__xi") * col("__y")).as("s"))
      .select(col("i"), lit(-1L).as("j"), col("s"))
    g.select(col("i"), col("j"), col("s")).unionByName(b)
  }

  /** Collect the normal equations and solve (G + λI)w = b driver-side
    * (Gaussian elimination with partial pivoting on a d×d system —
    * microseconds for any hashed-feature dimension). λ in micro units
    * keeps the API integer-first; the solve itself runs in doubles, so
    * like every estimator in this repo the WEIGHTS are post-processing,
    * never part of a bit oracle — the distributed sums are.
    */
  def fitRidge(df: DataFrame, featuresCol: String, labelCol: String,
      lambdaMicro: Long = 1000000L): Array[Double] = {
    val rows = normalEquations(df, featuresCol, labelCol).collect()
    val d = rows.map(_.getLong(0)).max.toInt + 1
    val g = Array.ofDim[Double](d, d + 1)
    rows.foreach { r =>
      val (i, j, s) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2))
      if (j == -1) g(i)(d) = s.toDouble else g(i)(j.toInt) = s.toDouble
    }
    val lam = lambdaMicro / 1e6
    (0 until d).foreach(i => g(i)(i) += lam)
    // Gaussian elimination, partial pivot
    for (c <- 0 until d) {
      val p = (c until d).maxBy(r => math.abs(g(r)(c)))
      val t = g(c); g(c) = g(p); g(p) = t
      require(math.abs(g(c)(c)) > 1e-12, s"singular normal equations at $c")
      for (r <- c + 1 until d) {
        val f = g(r)(c) / g(c)(c)
        for (k <- c to d) g(r)(k) -= f * g(c)(k)
      }
    }
    val w = new Array[Double](d)
    for (c <- d - 1 to 0 by -1) {
      var s = g(c)(d)
      for (k <- c + 1 until d) s -= g(c)(k) * w(k)
      w(c) = s / g(c)(c)
    }
    w
  }

  /** Scan-side scoring: dot(features, weights) with the weight vector
    * inlined as a literal array (broadcast-by-closure; d doubles).
    */
  def score(featuresCol: Column, weights: Array[Double]): Column =
    aggregate(
      zip_with(featuresCol, array(weights.map(lit): _*), (x, w) => x * w),
      lit(0.0d), (acc, v) => acc + v)
}
