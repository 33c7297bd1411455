package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution

/** Physical-plan audit: for every SparkEntry query, check the properties
  * that matter at 100 TB — broadcast joins where a side is dimension-
  * sized, no cartesian products anywhere, filter/column pushdown reaching
  * the parquet scans, and whole-stage codegen coverage. Prints one line
  * per query plus a summary; exits nonzero if a hard rule breaks.
  *
  * Hard rules:
  *   - no CartesianProduct / BroadcastNestedLoopJoin unless the query
  *     deliberately broadcasts a tiny side (ANN brute force);
  *   - every parquet scan must prune columns (ReadSchema narrower than
  *     the table) or be a full-schema consumer by design.
  */
object PlanAudit {
  // ONLY genuine theta-joins belong here. The LSH/SimHash/SRP bucket
  // self-joins all carry equi-keys (band/sig) beside the a < b filter, so
  // they must plan as hash or sort-merge joins. NOTE the audit sees the
  // bucket join directly only for g47 (simHashPairs returns the lazy
  // plan); g46/g48 localCheckpoint their results, so their audited plan
  // is a checkpoint scan — their join shape is pinned by the
  // bucket-self-join plan test in OpsSpec instead.
  private val nestedLoopAllowed = Set(
    "q27_ann_cosine_topk", // deliberate: broadcast query side vs all vectors
    "g49_ann_ivf",         // deliberate: probed-cluster join is a theta join
    "q68_quantized_ann",   // deliberate: broadcast quantized queries vs all codes
    "g89_ann_pq",          // deliberate: broadcast ADC tables vs all PQ codes
    "q82_sketch_overlap",  // deliberate: 5x5 sketch-table pair fan-out (a < b)
    "q87_hard_negatives",  // deliberate: broadcast query side vs all vectors (q27 shape + label predicate)
    "q100_hybrid_rrf",     // deliberate: dense side is the q27 broadcast theta-join
    "q107_pmi_bigrams",    // deliberate: crossJoin(broadcast(total)) of a 1-ROW aggregate
    "q113_mmr_diversify",  // deliberate: broadcast query side vs all vectors (q27 shape)
    "q132_join_size",      // deliberate: crossJoin(broadcast(·)) of a 1-ROW exact-size aggregate (q107 shape)
    "q135_vocab_drift",    // deliberate: crossJoin(broadcast(·)) of a 1-ROW totals aggregate (q107 shape)
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .withExtensions(new graft.expr.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var hardFailures = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe: QueryExecution = fn(spark, sfDir).queryExecution
        val plan = qe.executedPlan.toString()
        val cartesian = plan.contains("CartesianProduct")
        val nestedLoop = plan.contains("BroadcastNestedLoopJoin")
        val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
        val sortMerge = "SortMergeJoin".r.findAllIn(plan).length
        // codegen spans appear as "*(n)" operator prefixes in the plan string
        val codegenSpans = "\\*\\(\\d+\\)".r.findAllIn(plan).toSeq
          .map(_.drop(2).dropRight(1).toInt).distinct.length
        val scans = "Scan parquet".r.findAllIn(plan).length
        val flags = new StringBuilder
        if (cartesian) flags.append(" CARTESIAN!")
        if (nestedLoop && !nestedLoopAllowed(name)) flags.append(" NESTEDLOOP!")
        if ((cartesian || (nestedLoop && !nestedLoopAllowed(name))))
          hardFailures ::= name
        println(f"$name%-24s scans=$scans bhj=$broadcasts smj=$sortMerge " +
          f"codegen=$codegenSpans$flags")
      } catch {
        case e: Exception =>
          hardFailures ::= name
          println(f"$name%-24s PLAN FAILED: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
      }
    }
    println(s"== hard failures: ${hardFailures.size} ${hardFailures.mkString(",")}")
    spark.stop()
    if (hardFailures.nonEmpty) sys.exit(1)
  }
}
