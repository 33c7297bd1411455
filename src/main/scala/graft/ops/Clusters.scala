package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the step that
  * turns (a, b) similarity edges into dedup decisions: every document
  * gets a cluster id (the minimum doc id reachable through edges), and
  * the cluster id holder is the canonical survivor.
  *
  * Algorithm: iterative min-label propagation (each node adopts the
  * smallest label among itself and its neighbors) — converges in
  * O(diameter) rounds, and near-dup graphs have tiny diameters (dup
  * clusters are near-cliques). Each round is one shuffle; no driver-side
  * graph state, so it scales to billions of edges. Convergence is
  * checked with a count of changed labels per round.
  */
object Clusters {

  /** pairs: DataFrame with long columns `a`, `b` (undirected edges).
    * Returns (id, cluster) for every id that appears in any edge;
    * cluster = min id of its connected component.
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col("a").cast("long"), col("b").cast("long"))
      .union(pairs.select(col("b").cast("long").as("a"), col("a").cast("long").as("b")))
      .distinct()
      .persist()
    var labels = edges.select(col("a").as("id"))
      .distinct()
      .withColumn("cluster", col("id"))
      .persist()
    // the persisted frame currently backing `labels` — unpersisted only
    // after the NEXT round's frame has materialized, so nothing in the
    // live lineage ever recomputes from scratch
    var cached = labels
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      // each node's new label = min(own, min over neighbors' labels).
      // The joined frame carries both old and new labels, so the
      // convergence count comes from the SAME cached frame as the label
      // update — one aggregate action per round, not an extra
      // next-vs-labels join re-shuffling the full label table.
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("cluster", "nc"), "b")
        .groupBy(col("a").as("id"))
        .agg(min("nc").as("neighbor_min"))
      val joined = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("cluster").as("old"),
          least(col("cluster"), coalesce(col("neighbor_min"), col("cluster")))
            .as("cluster"))
        .persist()
      val changed = joined.filter(col("cluster") < col("old")).count()
      cached.unpersist() // joined is materialized; the old cache is dead
      cached = joined
      labels = joined.select(col("id"), col("cluster"))
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    // silent non-convergence would return SPLIT clusters (multiple
    // "canonical" survivors per true duplicate class) — fail loudly, but
    // free the cached labels first so failed calls don't pin storage
    if (!converged) {
      cached.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds " +
          "(graph diameter too large — raise maxIters)")
    }
    val out = labels.localCheckpoint(true)
    cached.unpersist()
    out
  }

  /** Full near-dup dedup decision: run LSH, cluster the verified pairs,
    * and return every doc with its cluster and a keep flag (the minimum
    * id in each cluster survives; singletons always survive).
    */
  def dedupDecision(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    // ids must be integral: edges are cast to long, and under ANSI a
    // string id would crash mid-job (with ANSI off it would silently
    // null the edges and disable dedup entirely)
    require(Seq("long", "integer", "short", "byte")
      .contains(df.schema(idCol).dataType.typeName),
      s"dedupDecision needs an integral id column, got ${df.schema(idCol).dataType}")
    val pairs = Dedup.minHashLsh(df, idCol, textCol, threshold)
    val comps = connectedComponents(pairs)
    df.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster"), col("id")).as("cluster"))
      .withColumn("keep", (col("id") === col("cluster")).cast("boolean"))
  }
}
