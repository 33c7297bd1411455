package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the data-versioning primitive of an
  * incremental training pipeline (what changed between crawl N−1 and
  * crawl N): every id is classified `added` / `removed` / `changed` /
  * `unchanged`, with content equality decided by the shared normalized
  * fingerprint ([[TextAnalysis.fingerprint]]) so whitespace-only
  * re-crawls classify as unchanged, consistent with the whole dedup
  * family.
  *
  * Scale shape: fingerprints are computed scan-side, the diff is ONE
  * full-outer equi-join on the id — at 100 TB write both snapshots
  * bucketed by the id column ([[Bucketing.writeBucketed]]) and the join
  * is co-located with no exchange on either side; nothing else
  * shuffles. Output carries both fingerprints for audit.
  */
object SnapshotDiff {

  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("__id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp_old"))
    val n = newSnap.select(col(idCol).as("__id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp_new"))
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol), col("fp_old"), col("fp_new"),
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") === col("fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
