package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of embedding columns — the standard memory
  * lever for ANN at 100 TB: a float32 corpus shrinks 4× (plus one scale
  * per vector), distance kernels become integer arithmetic, and the
  * quantized table is small enough to keep hot where the float one is
  * not.
  *
  * Numeric contract: every step is a correctly-rounded IEEE double op
  * (float→double cast is exact; abs/greatest are comparisons; `*`, `/`,
  * `+`, `floor` are exact-per-IEEE), so the codes are BIT-IDENTICAL in
  * any engine that runs the same formula — which is what makes the
  * DuckDB hash oracle possible and the quantized corpus reproducible
  * across rewrites.
  */
object Quantization {

  /** Per-vector symmetric scale: m = max|x_i|. Zero vectors get m = 0
    * (and quantize to all-zero codes).
    */
  def maxAbs(vec: Column): Column =
    aggregate(vec, lit(0d), (acc, x) => greatest(acc, abs(x)))

  /** Symmetric int8 codes: q_i = floor(x_i · 127 / m + 0.5), clamped to
    * [-127, 127] by construction (x_i = ±m hits exactly ±127; the +0.5
    * floor is round-half-up, identical for both signs in both engines —
    * unlike rint/HALF_EVEN, whose tie behavior differs across SQL
    * dialects). Scan-side codegen'd expression: no shuffle, no UDF.
    */
  def int8Codes(vec: Column): Column = {
    val m = maxAbs(vec)
    transform(vec, x =>
      when(m === 0d, lit(0L)).otherwise(
        floor(x * lit(127d) / m + lit(0.5d)).cast("long")))
  }

  /** Per-vector scale in micro-units as an exact integer:
    * floor(m·10⁶ + 0.5). Integer scales keep every downstream score in
    * exact (hence engine-portable) integer arithmetic.
    */
  def scaleMicro(vec: Column): Column =
    floor(maxAbs(vec) * lit(1e6) + lit(0.5d)).cast("long")

  /** Quantize an embedding table: (id, codes array<long>, scale_micro).
    * The codes are int8-ranged; `long` element type keeps downstream
    * integer dot products overflow-free without casts (|dot| ≤ 127²·dim).
    */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol), int8Codes(v).as("codes"), scaleMicro(v).as("scale_micro"))
  }

  /** Unit-normalize (zero vectors stay zero). sqrt and division are
    * correctly-rounded IEEE ops and the norm accumulates in index order,
    * so the unit vector is still bit-identical across engines.
    */
  def unitize(v: Column): Column = {
    val n = sqrt(aggregate(v, lit(0d), (acc, x) => acc + x * x))
    transform(v, x => when(n === 0d, lit(0d)).otherwise(x / n))
  }

  /** Quantize for COSINE serving: unit-normalize first, then int8. A raw
    * integer dot over codes of unnormalized vectors ranks by |y| as much
    * as by angle (recall@10 on the test corpus drops to 0.1); on the
    * unit sphere the dequantized dot IS the cosine up to quantization
    * error.
    */
  def quantizeUnit(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val u = unitize(col(vecCol).cast("array<double>"))
    df.select(col(idCol), int8Codes(u).as("codes"), scaleMicro(u).as("scale_micro"))
  }

  /** Top-k neighbors by rescaled integer dot product over quantized
    * codes — asymmetric-distance ANN where BOTH the score and the
    * ranking are exact integer arithmetic: no floating-point ties, no
    * cross-engine ulp drift, and the kernel vectorizes to int
    * multiply-adds.
    *
    * Vectors are unit-normalized before quantization (quantizeUnit), so
    * the score approximates cosine for ANY corpus. score =
    * (q_x · q_y) · scale_micro(y): the candidate rescale is REQUIRED,
    * not cosmetic — codes are x·127/m_x, so a candidate whose unit
    * vector has a small max-coordinate gets uniformly inflated codes and
    * the raw integer dot systematically over-ranks it. The query's own
    * scale is constant inside its rank partition, so dot·m_y is
    * monotone-equivalent to the dequantized dot. `queries` must be
    * broadcast-sized (the corpus side streams; one scan, no corpus
    * shuffle).
    */
  def int8TopK(vectors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val v = quantizeUnit(vectors, idCol, vecCol)
      .select(col(idCol).as("id"), col("codes"), col("scale_micro"))
    val q = broadcast(quantizeUnit(queries, idCol, vecCol)
      .select(col(idCol).as("qid"), col("codes").as("qcodes")))
    val joined = v.join(q, col("id") =!= col("qid"))
    val dot = aggregate(zip_with(col("codes"), col("qcodes"), (a, b) => a * b),
      lit(0L), (acc, z) => acc + z)
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id"))
    joined
      .withColumn("score", dot * col("scale_micro"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("id").as("neighbor"), col("score"))
  }
}
