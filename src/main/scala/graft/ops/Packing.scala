package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batch preparation: lay documents out
  * in a deterministic pseudo-random order, concatenate, and chunk the
  * token stream at `maxTokens` boundaries (the standard concat-then-split
  * packing; documents may straddle a chunk boundary, exactly like the
  * token stream fed to a causal-LM dataloader).
  *
  * Scale design: one GLOBAL stream would need a total order — a single
  * sort partition at 100 TB. Instead rows hash into `nBuckets`
  * independent streams and each bucket packs its own chunk sequence
  * (bin ids are (bucket, bin) pairs). The per-bucket window is an
  * ordinary shuffle+sort, fully parallel across buckets; pick nBuckets
  * at cluster parallelism so each sort fits an executor. Order, bucket,
  * and offsets all derive from `xxhash64(id, seed)`, so the layout is
  * bit-reproducible under any partitioning and re-derivable from the
  * seed alone.
  */
object Packing {

  /** Returns one row per document: its bucket, position (offset) in the
    * bucket's concatenated token stream, and the chunk (`bin`) where the
    * document STARTS. `tokensCol` must be a non-negative integral
    * column.
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      maxTokens: Int, nBuckets: Int = 64, seed: Long = 42L): DataFrame = {
    require(maxTokens > 0 && nBuckets > 0, "maxTokens and nBuckets must be positive")
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(nBuckets.toLong))
    val ord = xxhash64(col(idCol), lit(seed + 1L))
    val w = Window.partitionBy("bucket").orderBy(col("ord"), col(idCol))
    df.select(col(idCol), col(tokensCol).cast("long").as("toks"),
        bucket.as("bucket"), ord.as("ord"))
      .withColumn("cum", sum("toks").over(w))
      // integer div keeps both engines exact (no double rounding)
      .withColumn("bin", expr(s"(cum - toks) div $maxTokens"))
      .withColumn("offset", pmod(col("cum") - col("toks"), lit(maxTokens.toLong)))
      .drop("ord")
  }
}
