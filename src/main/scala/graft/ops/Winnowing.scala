package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Winnowing document sketches (Schleimer, Wilkerson, Aiken: "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
  * fingerprinting scheme). From each window of `window` consecutive
  * word-`k`-gram hashes, keep the minimum hash; the distinct kept hashes
  * are the document's sketch. Guarantee: any shared run of at least
  * k + window − 1 words between two documents contributes at least one
  * COMMON fingerprint — overlap detection robust to local edits, at a
  * sketch ~2/(window+1) the size of the full gram set.
  *
  * Spark-first shape: NO lambda/HOF chains (a transform over an inlined
  * split re-evaluates the split per element — the lambda-CSE trap), just
  * posexplode + doc-keyed windows: one shuffle on doc_id, per-doc sorts
  * run parallel across docs, every aggregate and frame is bounded. Gram
  * hashes are md5 hex strings and the window min is lexicographic —
  * portable to any SQL engine bit-for-bit.
  *
  * Docs with fewer than k words emit no fingerprints; docs with fewer
  * than window grams emit one (the min over all their grams), matching
  * the paper's convention.
  */
object Winnowing {

  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, window: Int = 4): DataFrame = {
    require(k >= 1 && window >= 1, s"k=$k and window=$window must be positive")
    val words = df
      .select(col(idCol).as("doc_id"),
        posexplode(split(lower(coalesce(col(textCol), lit(""))), " "))
          .as(Seq("__pos0", "__w")))
      .select(col("doc_id"), (col("__pos0") + 1).as("pos"), col("__w"))
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val gramParts = (0 until k).map(j =>
      if (j == 0) col("__w") else lead(col("__w"), j).over(byPos))
    val grams = words
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ", gramParts: _*)).as("h"),
        count(lit(1)).over(Window.partitionBy("doc_id")).as("__n"))
      // full k-grams only: the lead()s past the doc end are NULL and
      // concat_ws skips them, which would hash a short gram
      .filter(col("pos") <= col("__n") - (k - 1))
      .withColumn("__m", col("__n") - (k - 1))
    val frame = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, window - 1)
    grams
      .select(col("doc_id"), col("pos"), col("__m"),
        min(col("h")).over(frame).as("fp"))
      // one window per start position 1..m-window+1; short docs (m <
      // window) keep the single clipped window at pos 1
      .filter(col("pos") <= greatest(col("__m") - (window - 1), lit(1)))
      .select(col("doc_id"), col("fp"))
      .distinct()
  }
}
