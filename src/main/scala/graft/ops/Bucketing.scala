package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the co-located join strategy for repeated
  * large-to-large joins (SURVEY "repartition/bucketing for co-located
  * joins"). Writing both sides bucketed+sorted by the join key lets
  * every subsequent join run shuffle-free AND sort-free: the scan
  * satisfies the join's distribution and ordering requirements.
  *
  * At 100 TB this is the difference between shuffling the fact table on
  * every query and shuffling it once at ingest.
  */
object Bucketing {

  /** Write df as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — the resulting
    * plan has no Exchange on either side (verify with
    * df.queryExecution.executedPlan: SortMergeJoin over two scans).
    */
  def cogroupJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
