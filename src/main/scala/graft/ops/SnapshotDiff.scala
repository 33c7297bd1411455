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

  /** MERGE INTO for the incremental corpus: apply a changeset of
    * row-level `upsert` / `delete` operations to a base table. The
    * result keeps every base row the changeset doesn't touch, replaces
    * or inserts the payload of every `upsert`, and drops every
    * `delete`d id. `changes` must carry the id, `opCol` (the literal
    * strings "upsert" / "delete"), and the same payload columns as
    * `base`.
    *
    * Scale shape: ONE full-outer equi-join on the id — co-located with
    * no exchange when both sides are bucketed by the id
    * ([[Bucketing.writeBucketed]]), which is how an incremental crawl
    * pipeline runs this nightly at 100 TB: the changeset is small, the
    * base is huge, and nothing but the changed buckets rewrites.
    * Row-level decisions are pure column arithmetic — deterministic and
    * exactly replayable in SQL (the q90 oracle).
    */
  def applyChanges(base: DataFrame, changes: DataFrame, idCol: String,
      opCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == idCol).toSeq
    val b = base.select(col(idCol).as("__id"),
      struct(payload.map(col): _*).as("__b"))
    val c = changes.select(col(idCol).as("__id"), col(opCol).as("__op"),
      struct(payload.map(col): _*).as("__c"))
    val picked = b.join(c, Seq("__id"), "full_outer")
      // base-only rows carry a null __op and must survive
      .filter(col("__op").isNull || col("__op") =!= "delete")
      .withColumn("__row",
        when(col("__op") === "upsert", col("__c")).otherwise(col("__b")))
    picked.select(col("__id").as(idCol) +: payload.map(p => col("__row")(p).as(p)): _*)
  }
}
