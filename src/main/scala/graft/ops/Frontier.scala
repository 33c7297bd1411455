package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl frontier scheduling: the step between "candidates scored"
  * and "fetches issued" in a crawl loop. Per host, the best-scored
  * candidates get fetch slots spaced by that host's crawl delay (the
  * robots.txt `robots_crawl_delay` surface feeds straight in), and the
  * per-host queue is CAPPED — politeness and host-budget in one pass.
  *
  * Semantics:
  *   - within a host, candidates rank by (score DESC, id ASC) — a
  *     total, deterministic order (id must be unique non-null; a null
  *     score ranks last);
  *   - only the top `maxPerHost` per host survive;
  *   - slot `rank` fetches at `(rank - 1) * crawl_delay_s` (a host
  *     with no delay row uses `defaultDelayS`).
  *
  * Scale shape: the ranking projects down to exactly (host, score,
  * id) before the window, which is the shape
  * [[graft.plans.TopKRewrite]] proves equivalent to the bounded-heap
  * `topk_agg` aggregate — the shuffle carries at most `maxPerHost`
  * rows per host per map task instead of every candidate of every hot
  * host (FrontierSpec pins the rewrite firing on this exact plan).
  * Callers re-attach candidate payloads by joining on id: hosts×cap
  * rows against the corpus, an equi-join AQE can broadcast when the
  * schedule is small.
  */
object Frontier {

  /** Fetch schedule: (idCol, hostCol, rank, fetch_at_s). `delays` has
    * (hostCol, crawl_delay_s) — seconds per request for that host.
    */
  def schedule(candidates: DataFrame, idCol: String, hostCol: String,
      scoreCol: String, delays: DataFrame, maxPerHost: Int,
      defaultDelayS: Long = 1L): DataFrame = {
    require(maxPerHost >= 1, s"maxPerHost must be >= 1: $maxPerHost")
    // exactly (key, ord, id), ord/id provably non-nullable — the
    // TopKRewrite-eligible window input
    val slim = candidates.select(
      col(hostCol).as("__host"),
      coalesce(col(scoreCol).cast("double"),
        lit(Double.NegativeInfinity)).as("__score"),
      // parquet scalars are nullable-by-schema even when never null;
      // the rewrite demands a PROVABLY non-null id, so pin it (the
      // unique-non-null id contract makes the sentinel unreachable)
      coalesce(col(idCol).cast("long"), lit(Long.MinValue)).as("__id"))
    val w = Window.partitionBy(col("__host"))
      .orderBy(col("__score").desc, col("__id").asc)
    val ranked = slim.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= lit(maxPerHost))
    // defensive per-host uniqueness: duplicate (host, delay) rows in
    // the caller's delays frame must not fan out scheduled fetches
    // (r11 advice) — min() keeps the strictest published delay
    val d = delays.groupBy(col(hostCol).as("__host"))
      .agg(min(col("crawl_delay_s").cast("long")).as("__delay"))
    ranked.join(d, Seq("__host"), "left")
      .select(col("__id").as(idCol), col("__host").as(hostCol),
        col("rank").cast("long").as("rank"),
        ((col("rank") - 1).cast("long") *
          coalesce(col("__delay"), lit(defaultDelayS))).as("fetch_at_s"))
  }
}
