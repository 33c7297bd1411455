package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., TPAMI 2011) — the third ANN
  * memory lever, beyond IVF partition pruning (ops/Similarity) and
  * scalar int8 (ops/Quantization): split each unit-normalized vector
  * into `m` subvectors, k-means each subspace into `k` codewords, and
  * store only the m codeword ids — at m=8, k=16 a 64-dim float32
  * vector becomes 8 nibbles, a 64× compression, scored without ever
  * reconstructing the vector.
  *
  * Scale shape mirrors the rest of the ANN family: codebooks are
  * m·k·(d/m) doubles (a few KB) fit on a bounded driver-side sample and
  * broadcast; encoding is a scan-side lookup; asymmetric-distance
  * scoring (ADC) precomputes each query's m×k dot-product table ONCE,
  * broadcasts it, and scores a candidate with m array lookups + adds —
  * no per-candidate float dot products, no shuffle of the corpus.
  */
object Pq {

  /** Plain (non-spherical) L2 k-means on a driver-side sample of each
    * subspace. Sampling contract is Similarity.fitCentroids': a
    * corpus-wide `.sample()`, never `limit()` (first-partitions bias);
    * the collect is bounded by sampleSize. Empty clusters respawn on
    * the farthest point, ties break deterministically by index.
    * Returns codebooks[m][k][d/m].
    */
  def fitCodebooks(vectors: DataFrame, vecCol: String, m: Int, k: Int,
      iters: Int = 10, sampleSize: Int = 10000, seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(m >= 1 && k >= 2, s"need m >= 1 subspaces and k >= 2 codewords: $m, $k")
    val total = vectors.count()
    val base = vectors.select(unitize(col(vecCol).cast("array<double>")).as("u"))
    val sampled =
      if (total <= sampleSize) base
      else base.sample(withReplacement = false,
        math.min(1.0, 1.1 * sampleSize / total), seed)
    val sample = sampled.limit(sampleSize).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty corpus")
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val sub = d / m
    Array.tabulate(m) { s =>
      val pts = sample.map(v => v.slice(s * sub, (s + 1) * sub))
      kmeans(pts, k, iters, seed + s)
    }
  }

  private def kmeans(pts: Array[Array[Double]], k: Int, iters: Int,
      seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val n = pts.length
    var centers = Array.tabulate(k)(i => pts(if (n >= k) i * (n / k) else rnd.nextInt(n)).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](pts.head.length))
      val counts = new Array[Long](k)
      val dists = new Array[Double](n)
      var j = 0
      while (j < n) {
        val p = pts(j)
        val c = nearestL2(centers, p)
        dists(j) = distL2(centers(c), p)
        counts(c) += 1
        var i = 0
        while (i < p.length) { sums(c)(i) += p(i); i += 1 }
        j += 1
      }
      // empty clusters respawn on the farthest points: the e-th empty
      // cluster (ascending cluster id) takes the point with the e-th
      // largest distance to its assigned center, ties broken by lowest
      // point index — fully deterministic, no RNG draw
      val byFarthest = Array.tabulate(n)(identity)
        .sortBy(i => (-dists(i), i))
      var nextFar = 0
      centers = Array.tabulate(k) { c =>
        if (counts(c) == 0L) {
          val p = pts(byFarthest(math.min(nextFar, n - 1))).clone()
          nextFar += 1
          p
        } else sums(c).map(_ / counts(c))
      }
    }
    centers
  }

  private def distL2(a: Array[Double], b: Array[Double]): Double = {
    var (d2, i) = (0d, 0)
    while (i < a.length) { val t = a(i) - b(i); d2 += t * t; i += 1 }
    d2
  }

  private def nearestL2(centers: Array[Array[Double]], p: Array[Double]): Int = {
    var (best, bestD) = (0, Double.MaxValue)
    var c = 0
    while (c < centers.length) {
      var (d2, i) = (0d, 0)
      while (i < p.length) { val t = p(i) - centers(c)(i); d2 += t * t; i += 1 }
      if (d2 < bestD) { best = c; bestD = d2 }
      c += 1
    }
    best
  }

  private def unitize(v: Column): Column = {
    val norm = sqrt(aggregate(v, lit(0d), (acc, x) => acc + x * x))
    transform(v, x => when(norm === 0d, lit(0d)).otherwise(x / norm))
  }

  /** Encode the corpus: (idCol, codes array<int> of length m) — per
    * subspace, the nearest codeword id. Broadcast-codebook scan-side
    * map; the encoded table is the thing you keep hot at 100 TB.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val spark = df.sparkSession
    val cb = spark.sparkContext.broadcast(codebooks)
    val enc = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      val norm = math.sqrt(arr.map(x => x * x).sum)
      val u = if (norm == 0d) arr else arr.map(_ / norm)
      val m = cb.value.length
      val sub = u.length / m
      Array.tabulate(m)(s => nearestL2(cb.value(s), u.slice(s * sub, (s + 1) * sub)))
    }
    df.select(col(idCol), enc(col(vecCol).cast("array<double>")).as("codes"))
  }

  /** ADC top-k: each query's m×k inner-product table is flattened to a
    * single broadcast array (tab[s·k + c] = ⟨q_s, codebook_s[c]⟩ in
    * integer micros for an exact, tie-stable ranking); a candidate's
    * score is m lookups summed — pure HOF arithmetic inside codegen,
    * one corpus scan, no reconstruction.
    */
  def adcTopK(encoded: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, codebooks: Array[Array[Array[Double]]], topK: Int): DataFrame = {
    val k = codebooks.head.length
    val tableOf = adcTable(codebooks)
    val q = broadcast(queries
      .select(col(idCol).as("qid"),
        tableOf(col(vecCol).cast("array<double>")).as("tab")))
    val score = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(codebooks.length - 1)),
        (c, s) => element_at(col("tab"), s * k + c + 1)),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id"))
    encoded.select(col(idCol).as("id"), col("codes"))
      .join(q, col("id") =!= col("qid"))
      .withColumn("score", score)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("qid"), col("rnk").cast("long").as("rnk"),
        col("id").as("neighbor"), col("score"))
  }

  // ------------------------------------------------------ IVF-PQ index

  /** Persist an IVF-PQ index — the faiss-style recipe with ALL THREE
    * 100 TB ANN levers stacked: coarse clusters become parquet
    * PARTITIONS (probing prunes whole directories, the g67/g86
    * contract), rows inside hold only the m PQ codes (~40× smaller
    * than float64), and serving scores by table lookup. Codebooks and
    * centroids persist as constant-size metadata tables beside the
    * codes.
    */
  def writePqIvfIndex(vectors: DataFrame, idCol: String, vecCol: String,
      path: String, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): Unit = {
    val spark = vectors.sparkSession
    val assigned = Similarity.assignClusters(vectors, vecCol, centroids)
    encode(assigned, idCol, vecCol, codebooks)
      .join(assigned.select(col(idCol), col("cluster")), idCol)
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$path/vectors")
    Similarity.writeCentroidTable(spark, centroids, path)
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (w, c) => (s, c, w.toSeq) }
    }.toSeq.toDF("s", "c", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Top-k from an IVF-PQ disk index: probe clusters driver-side
    * (bounded collects — nlist centroids, nProbe ids per query), scan
    * ONLY the probed code directories, ADC-score against the broadcast
    * per-query tables. Same ranking kernel as [[adcTopK]], so the two
    * paths agree exactly on shared candidates.
    */
  def pqIvfTopKFromIndex(indexPath: String, queries: DataFrame,
      idCol: String, vecCol: String, topK: Int, nProbe: Int = 2): DataFrame = {
    val spark = queries.sparkSession
    val centroids = spark.read.parquet(s"$indexPath/centroids")
      .orderBy("cluster").collect().map(_.getSeq[Double](1).toArray)
    val cbRows = spark.read.parquet(s"$indexPath/codebooks").collect()
    val m = cbRows.map(_.getInt(0)).max + 1
    val k = cbRows.map(_.getInt(1)).max + 1
    val codebooks = Array.ofDim[Array[Double]](m, k)
    cbRows.foreach(r => codebooks(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray)
    val tableOf = adcTable(codebooks)
    val qq = queries
      .select(col(idCol).as("qid"),
        tableOf(col(vecCol).cast("array<double>")).as("tab"),
        explode(Similarity.probeIds(spark, centroids, nProbe)(
          col(vecCol).cast("array<double>"))).as("probe"))
    val probed = qq.select("probe").distinct().collect().map(_.getInt(0))
    val corpus = spark.read.parquet(s"$indexPath/vectors")
      .filter(col("cluster").isin(probed.map(Integer.valueOf): _*))
      .select(col(idCol).as("id"), col("codes"), col("cluster"))
    val score = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
        (c, s) => element_at(col("tab"), s * k + c + 1)),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id"))
    corpus.join(broadcast(qq),
      col("cluster") === col("probe") && col("id") =!= col("qid"))
      .withColumn("score", score)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("qid"), col("rnk").cast("long").as("rnk"),
        col("id").as("neighbor"), col("score"))
  }

  // ------------------------------------- residual IVF-PQ (faiss proper)

  /** Fit codebooks on RESIDUALS to the coarse centroids — the actual
    * faiss IVF-PQ recipe. The coarse quantizer already explains most of
    * each vector's energy; PQ-ing what REMAINS (unit(v) − centroid)
    * spends the same code bits on a much smaller-variance signal, so
    * reconstruction error (and therefore ranking error) drops at
    * identical (m, k). Same bounded-sample contract as [[fitCodebooks]].
    */
  def fitResidualCodebooks(vectors: DataFrame, vecCol: String,
      centroids: Array[Array[Double]], m: Int, k: Int, iters: Int = 10,
      sampleSize: Int = 10000, seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(m >= 1 && k >= 2, s"need m >= 1 subspaces and k >= 2 codewords: $m, $k")
    val total = vectors.count()
    val base = vectors.select(unitize(col(vecCol).cast("array<double>")).as("u"))
    val sampled =
      if (total <= sampleSize) base
      else base.sample(withReplacement = false,
        math.min(1.0, 1.1 * sampleSize / total), seed)
    val sample = sampled.limit(sampleSize).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty corpus")
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val sub = d / m
    val residuals = sample.map { u =>
      val c = centroids(nearestL2(centroids, u))
      Array.tabulate(d)(i => u(i) - c(i))
    }
    Array.tabulate(m) { s =>
      val pts = residuals.map(r => r.slice(s * sub, (s + 1) * sub))
      kmeans(pts, k, iters, seed + s)
    }
  }

  /** Persist a RESIDUAL IVF-PQ index: same layout as
    * [[writePqIvfIndex]] (cluster partitions, code rows, metadata
    * tables) but codes quantize the residual to the assigned centroid.
    */
  def writeResidualPqIvfIndex(vectors: DataFrame, idCol: String, vecCol: String,
      path: String, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]]): Unit = {
    val spark = vectors.sparkSession
    val cs = spark.sparkContext.broadcast(centroids)
    val cb = spark.sparkContext.broadcast(codebooks)
    val enc = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      val norm = math.sqrt(arr.map(x => x * x).sum)
      val u = if (norm == 0d) arr else arr.map(_ / norm)
      val c = nearestL2(cs.value, u)
      val cen = cs.value(c)
      val r = Array.tabulate(u.length)(i => u(i) - cen(i))
      val m = cb.value.length
      val sub = u.length / m
      (c, Array.tabulate(m)(s => nearestL2(cb.value(s), r.slice(s * sub, (s + 1) * sub))))
    }
    vectors.select(col(idCol), enc(col(vecCol).cast("array<double>")).as("e"))
      .select(col(idCol), col("e._1").as("cluster"), col("e._2").as("codes"))
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$path/vectors")
    Similarity.writeCentroidTable(spark, centroids, path)
    import spark.implicits._
    codebooks.zipWithIndex.flatMap { case (cbk, s) =>
      cbk.zipWithIndex.map { case (w, c) => (s, c, w.toSeq) }
    }.toSeq.toDF("s", "c", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Top-k from a residual IVF-PQ index: per (query, probed cluster)
    * the score decomposes as ⟨q, v⟩ ≈ ⟨q, centroid⟩ + ⟨q, residual⟩ —
    * a per-probe integer BIAS plus the same m ADC table lookups, so
    * serving stays table-lookup-only and the probed directories remain
    * the only ones opened.
    */
  def residualPqIvfTopKFromIndex(indexPath: String, queries: DataFrame,
      idCol: String, vecCol: String, topK: Int, nProbe: Int = 2): DataFrame = {
    val spark = queries.sparkSession
    val centroids = spark.read.parquet(s"$indexPath/centroids")
      .orderBy("cluster").collect().map(_.getSeq[Double](1).toArray)
    val cbRows = spark.read.parquet(s"$indexPath/codebooks").collect()
    val m = cbRows.map(_.getInt(0)).max + 1
    val k = cbRows.map(_.getInt(1)).max + 1
    val codebooks = Array.ofDim[Array[Double]](m, k)
    cbRows.foreach(r => codebooks(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray)
    val tableOf = adcTable(codebooks)
    val cs = spark.sparkContext.broadcast(centroids)
    // nProbe (probe, bias) pairs per query: bias = ⟨unit(q), centroid⟩ micros
    val probeBias = udf { (v: Seq[Double]) =>
      val arr = v.toArray
      val norm = math.sqrt(arr.map(x => x * x).sum)
      val u = if (norm == 0d) arr else arr.map(_ / norm)
      cs.value.indices.map { c =>
        var (d2, i) = (0d, 0)
        while (i < u.length) { val t = u(i) - cs.value(c)(i); d2 += t * t; i += 1 }
        (c, d2)
      }.sortBy(_._2).take(nProbe).map { case (c, _) =>
        var (dot, i) = (0d, 0)
        while (i < u.length) { dot += u(i) * cs.value(c)(i); i += 1 }
        (c, math.floor(dot * 1e6 + 0.5).toLong)
      }
    }
    val qq = queries
      .select(col(idCol).as("qid"),
        tableOf(col(vecCol).cast("array<double>")).as("tab"),
        explode(probeBias(col(vecCol).cast("array<double>"))).as("pb"))
      .select(col("qid"), col("tab"), col("pb._1").as("probe"),
        col("pb._2").as("bias"))
    val probed = qq.select("probe").distinct().collect().map(_.getInt(0))
    val corpus = spark.read.parquet(s"$indexPath/vectors")
      .filter(col("cluster").isin(probed.map(Integer.valueOf): _*))
      .select(col(idCol).as("id"), col("codes"), col("cluster"))
    val score = col("bias") + aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
        (c, s) => element_at(col("tab"), s * k + c + 1)),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id"))
    corpus.join(broadcast(qq),
      col("cluster") === col("probe") && col("id") =!= col("qid"))
      .withColumn("score", score)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("qid"), col("rnk").cast("long").as("rnk"),
        col("id").as("neighbor"), col("score"))
  }

  /** The per-query ADC table as a UDF: tab[s·k + c] = ⟨q_s, cb_s[c]⟩ in
    * integer micros (shared by [[adcTopK]] and the IVF-PQ serving path
    * so their scores are identical by construction).
    */
  private def adcTable(codebooks: Array[Array[Array[Double]]]) = {
    val k = codebooks.head.length
    udf { (v: Seq[Double]) =>
      val arr = v.toArray
      val norm = math.sqrt(arr.map(x => x * x).sum)
      val u = if (norm == 0d) arr else arr.map(_ / norm)
      val m = codebooks.length
      val sub = u.length / m
      (for (s <- 0 until m; c <- 0 until k) yield {
        val cw = codebooks(s)(c)
        var (dot, i) = (0d, 0)
        while (i < sub) { dot += u(s * sub + i) * cw(i); i += 1 }
        math.floor(dot * 1e6 + 0.5).toLong
      }).toArray
    }
  }
}
