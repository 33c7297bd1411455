package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (Array[Float]).
  *
  * Scale design: the query set is always the small side — broadcast it.
  * The brute-force path scans every vector once (embarrassingly
  * parallel); the IVF path prunes the scan to the probed clusters, which
  * is the standard way to keep ANN sub-linear at 100 TB (cluster
  * assignment is a partition-prunable column in a real deployment:
  * write the table partitioned by cluster id).
  */
object Similarity {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, z) => acc + z)
  private def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0d), (acc, x) => acc + x * x))

  /** Cosine between two array<double> columns: uses the native codegen'd
    * `cosine_sim` expression when the session registered GraftExtensions
    * (one fused loop), else the portable higher-order-function
    * composition. Same accumulation order → bit-identical results.
    */
  def cosine(df: DataFrame, a: Column, b: Column): Column = {
    val raw =
      if (df.sparkSession.catalog.functionExists("cosine_sim"))
        call_function("cosine_sim", a, b)
      else dot(a, b) / (norm(a) * norm(b))
    // zero-norm vectors give 0/0 = NaN, and NaN sorts ABOVE every real in
    // a descending rank — a single all-zero embedding would become the
    // top neighbor of every query. Map NaN to -1 (worst similarity).
    nanvl(raw, lit(-1d))
  }

  /** Exact cosine top-k per query. `queries` must be broadcast-sized. */
  def bruteForceTopK(vectors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val q = broadcast(queries
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    val joined = v.join(q, col("id") =!= col("qid"))
    joined
      .withColumn("cosine", cosine(joined, col("v"), col("qv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("id").as("neighbor"), col("cosine"))
  }

  /** Unit-normalize in place (zero vectors stay zero). The IVF index
    * serves COSINE queries, so clustering must happen on the unit
    * sphere: L2 k-means on raw vectors partitions by magnitude as much
    * as by direction, and a query's nearest-centroid probe then misses
    * the clusters holding its true cosine neighbors. On the sphere,
    * L2-nearest ≡ cosine-nearest (|a-b|² = 2 - 2·cos for unit a, b).
    */
  private def unit(x: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    val n = math.sqrt(s)
    if (n > 0) { i = 0; while (i < x.length) { x(i) /= n; i += 1 } }
    x
  }

  /** Spherical k-means on a driver-side sample — centroids are a tiny
    * broadcastable table (nCentroids × dim doubles), fit and kept on
    * the unit sphere. Good enough to build an IVF index; a production
    * fit would use sampled minibatch refinement, same output shape.
    */
  def fitCentroids(vectors: DataFrame, vecCol: String, nCentroids: Int,
      iters: Int = 8, sampleSize: Int = 10000, seed: Long = 42L): Array[Array[Double]] = {
    // a corpus-wide random sample, NOT limit(): limit takes the first
    // partitions in order, so at scale the fit would only ever see the
    // leading shard of the corpus (first-partitions bias). The fraction
    // overshoots by 10% then trims to keep the collect bounded.
    val total = vectors.count()
    val base = vectors.select(col(vecCol).cast("array<double>"))
    val sampled =
      if (total <= sampleSize) base
      else base.sample(withReplacement = false,
        math.min(1.0, 1.1 * sampleSize / total), seed)
    val sample = sampled.limit(sampleSize).collect()
      .map(r => unit(r.getSeq[Double](0).toArray))
    require(sample.length >= nCentroids, "need at least nCentroids sample vectors")
    val rng = graft.runtime.Rng.forKey(seed, sample.length.toLong)
    var centroids = rng.ints(0, sample.length).distinct().limit(nCentroids)
      .toArray.map(sample(_).clone)
    (0 until iters).foreach { _ =>
      val sums = Array.fill(nCentroids)(new Array[Double](sample.head.length))
      val counts = new Array[Int](nCentroids)
      sample.foreach { x =>
        val c = nearest(centroids, x)
        counts(c) += 1
        var i = 0
        while (i < x.length) { sums(c)(i) += x(i); i += 1 }
      }
      // re-normalize the mean: spherical k-means keeps centroids unit so
      // the assignment metric stays cosine-equivalent
      centroids = sums.zip(counts).zipWithIndex.map { case ((s, n), i) =>
        if (n == 0) centroids(i) else unit(s.map(_ / n))
      }
    }
    centroids
  }

  private def nearest(cs: Array[Array[Double]], x: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0
      var i = 0
      while (i < x.length) { val t = cs(c)(i) - x(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Assign each vector its IVF cluster id (the partition-pruning column). */
  def assignClusters(vectors: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val cs = vectors.sparkSession.sparkContext.broadcast(centroids)
    val assign = udf((v: Seq[Double]) => nearest(cs.value, unit(v.toArray)))
    vectors.withColumn("cluster", assign(col(vecCol).cast("array<double>")))
  }

  /** IVF top-k: probe only the `nProbe` clusters nearest to each query —
    * the scan shrinks by ~nCentroids/nProbe. Exactness is traded for
    * recall, the standard IVF contract.
    */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, centroids: Array[Array[Double]],
      nProbe: Int = 2): DataFrame = {
    val assigned = assignClusters(vectors, vecCol, centroids)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"),
        col("cluster"))
    val cs = vectors.sparkSession.sparkContext.broadcast(centroids)
    val probes = udf { (v: Seq[Double]) =>
      val x = unit(v.toArray)
      cs.value.indices
        .map(c => c -> {
          var d = 0.0; var i = 0
          while (i < x.length) { val t = cs.value(c)(i) - x(i); d += t * t; i += 1 }
          d
        })
        .sortBy(_._2).take(nProbe).map(_._1)
    }
    val q = broadcast(queries
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("probe", explode(probes(col("qv")))))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id"))
    val joined = assigned.join(q, col("cluster") === col("probe") && col("id") =!= col("qid"))
    joined
      .withColumn("cosine", cosine(joined, col("v"), col("qv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("id").as("neighbor"), col("cosine"))
  }
}
