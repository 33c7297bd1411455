package graft.tools

/** Configuration-invariance parity proof — the sibling of
  * [[ClusterParityCheck]] for the knobs a cluster admin tunes freely.
  *
  * A result that silently depends on `spark.sql.shuffle.partitions`,
  * AQE, or the scan split size is not reproducible at 100 TB: the same
  * job re-run after an ops-side tuning change would produce different
  * data. Hidden dependences of exactly this kind are easy to introduce
  * (`spark_partition_id()` leaking into output, `first()` /
  * `collect_list()` without an explicit sort, per-partition RNG keyed
  * off the SHUFFLE layout instead of the data, float folds whose
  * rounding depends on combine-tree shape) and no single-config test
  * can catch them.
  *
  * This main runs the registered suite under a baseline session (the
  * repo's standard local[32], shuffle=32, AQE on) and then under
  * deliberately hostile perturbations, comparing the order-independent
  * exact digest of every query against baseline:
  *
  *   - `shuffle7`: `spark.sql.shuffle.partitions=7` (prime, divides
  *     nothing) with AQE OFF — raw shuffle layouts differ from baseline
  *     in every exchange;
  *   - `smallsplits`: `spark.sql.files.maxPartitionBytes=1m` and
  *     `openCostInBytes=0` — parquet scans split into many more input
  *     partitions, stressing every mapPartitions seam and scan-order
  *     assumption.
  *
  * Usage: `graft.tools.ConfParityCheck [sfDir] [q1,q2,...|all]`
  * Prints one JSON line; exits 1 on any digest mismatch.
  */
object ConfParityCheck {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = ParityHarness.resolveNames(
      args.lift(1).orElse(Some("all")), Seq.empty)
    val passes = Seq(
      "baseline" -> Map.empty[String, String],
      "shuffle7" -> Map(
        "spark.sql.shuffle.partitions" -> "7",
        "spark.sql.adaptive.enabled" -> "false"),
      "smallsplits" -> Map(
        "spark.sql.files.maxPartitionBytes" -> "1m",
        "spark.sql.files.openCostInBytes" -> "0"))
      .map { case (label, confs) =>
        label -> ParityHarness.runPass("local[32]", confs, sfDir, names)
      }
    if (ParityHarness.report("conf_parity", sfDir, names, passes) > 0)
      sys.exit(1)
  }
}
