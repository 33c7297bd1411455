package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance diversification (Carbonell & Goldstein,
  * SIGIR 1998) — the retrieval-side dedup: from a per-query candidate
  * list (already scored for relevance, e.g. an ANN top-N), greedily
  * pick k results that trade relevance against redundancy:
  *
  *   score(c) = λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)
  *
  * For a training-data pipeline this is how you sample diverse
  * exemplars from a near-duplicate-heavy retrieval pool.
  *
  * Scale shape: the greedy loop is inherently sequential PER QUERY but
  * embarrassingly parallel ACROSS queries, and the candidate list is
  * bounded by construction (it IS a top-N). So: one shuffle groups the
  * N candidates of each query onto one executor, and `flatMapGroups`
  * runs the O(k·N) greedy there — no driver state, no cross-query
  * traffic, no corpus-sized anything.
  *
  * All arithmetic is integer (micro-cosines, permille λ) with
  * half-away-from-zero rounding, so an ANSI SQL engine unrolling the
  * same greedy reproduces scores bit-for-bit (q113's oracle).
  */
object Mmr {

  /** Greedy-select `k` of each query's candidates.
    *
    * Input columns: `qidCol` (long), `idCol` (long), `relCol`
    * (relevance in integer micros, long), `vecCol` (array<double> —
    * used for candidate-candidate cosine). Emits
    * (qid, rnk 1..k, id, mmr_score) where rank 1's score is λ·rel
    * (nothing selected yet, the redundancy term is zero).
    */
  def diversify(cands: DataFrame, qidCol: String, idCol: String,
      relCol: String, vecCol: String, k: Int, lambdaPermille: Long): DataFrame = {
    require(k >= 1 && lambdaPermille >= 0 && lambdaPermille <= 1000)
    val spark = cands.sparkSession
    import spark.implicits._
    val lam = lambdaPermille
    val ds = cands.select(col(qidCol).cast("long"), col(idCol).cast("long"),
        col(relCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Long, Long, Seq[Double])]
    ds.groupByKey(_._1).flatMapGroups { (qid, it) =>
      // bounded by construction: the caller feeds a per-query top-N
      val arr = it.toArray.sortBy(t => (-t._3, t._2))
      val n = arr.length
      val vecs = arr.map(_._4.toArray)
      val norms = vecs.map { v =>
        var (s, i) = (0d, 0)
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        math.sqrt(s)
      }
      // cosine in integer micros, same accumulation order and the same
      // half-away-from-zero rounding as the SQL oracle
      def simMicro(a: Int, b: Int): Long = {
        val (va, vb) = (vecs(a), vecs(b))
        var (dot, i) = (0d, 0)
        while (i < va.length) { dot += va(i) * vb(i); i += 1 }
        val nn = norms(a) * norms(b)
        if (nn == 0d) 0L // zero-norm guard: BigDecimal(NaN) would throw
        else BigDecimal(dot / nn * 1000000d)
          .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
      }
      val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      while (selected.length < math.min(k, n)) {
        var (best, bestScore, bestId) = (-1, Long.MinValue, Long.MaxValue)
        var c = 0
        while (c < n) {
          if (!selected.contains(c)) {
            var maxSim = 0L
            if (selected.nonEmpty) {
              maxSim = Long.MinValue
              selected.foreach { s => val sm = simMicro(c, s); if (sm > maxSim) maxSim = sm }
            }
            val score = lam * arr(c)._3 - (1000L - lam) * maxSim
            if (score > bestScore || (score == bestScore && arr(c)._2 < bestId)) {
              best = c; bestScore = score; bestId = arr(c)._2
            }
          }
          c += 1
        }
        selected += best
        out += ((qid, selected.length.toLong, arr(best)._2, bestScore))
      }
      out
    }.toDF("qid", "rnk", "id", "mmr_score")
  }
}
