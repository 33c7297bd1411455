package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining: adjacent-bigram association scores over a text
  * corpus, in exact integer arithmetic. The association measure is the
  * PMI likelihood ratio scaled to milli-units,
  *   lr_milli = ⌊c_xy · N · 1000 / (c_x · c_y)⌋
  * (N = total tokens) — the integer-monotone image of pointwise mutual
  * information exp-form, so ranking and thresholding agree with PMI
  * while both engines reproduce every value bit-for-bit (no log calls).
  *
  * Scale shape: one scan builds the staged token array (persist barrier
  * — Catalyst does not CSE inside lambda bodies, so pairing against an
  * inlined split would re-split per element); bigrams come from an
  * indexed transform over that attribute, scan-side, no pairing
  * shuffle. Then two map-side-combinable aggs (bigram counts, unigram
  * counts) and two word-keyed joins of dimension-sized count tables.
  * The `minCount` filter runs BEFORE the unigram joins, so the joined
  * table is the reporting set, not the full bigram vocabulary.
  *
  * 64-bit bound: c_xy·N·1000 must stay under 2^63 — with minCount
  * pruning the reported c_xy and token totals in the billions this
  * holds to ~10^6× the test corpus; past that, compute lr over
  * per-shard token counts and merge, or drop to ratio-of-ratios.
  */
object Collocations {

  /** (w1, w2, c_xy, c_x, c_y, lr_milli) for adjacent bigrams with
    * c_xy >= minCount. Tokenization: lower, trim, split on whitespace,
    * drop empties (the corpus-wide convention).
    */
  def pmiBigrams(df: DataFrame, textCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    val toks = df
      .select(filter(split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+"),
        t => length(t) > 0).as("w"))
      .persist()
    val uni = toks.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val total = toks.select(explode(col("w")).as("t"))
      .agg(count(lit(1)).as("n"))
    val pairs = toks
      .filter(size(col("w")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("w")) - 2),
        i => struct(element_at(col("w"), i + 1).as("w1"),
          element_at(col("w"), i + 2).as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
    val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    big
      .join(uni.select(col("t").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("t").as("w2"), col("c").as("c_y")), "w2")
      .crossJoin(broadcast(total))
      .selectExpr("w1", "w2", "c_xy", "c_x", "c_y",
        "c_xy * n * 1000L div (c_x * c_y) AS lr_milli")
  }
}
