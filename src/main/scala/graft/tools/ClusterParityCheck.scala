package graft.tools

/** Executor-process-boundary parity proof.
  *
  * Everything else in this repo runs on `local[32]` — one JVM, where a
  * broken closure-serialization path, a driver-only side channel, or a
  * non-serializable expression would never surface. Spark's
  * `local-cluster[n, cores, mem]` master is the test-only mode Spark
  * itself uses for exactly this gap: it forks REAL executor JVMs (one
  * Worker per slot) that talk to the driver over the network, serialize
  * every task closure and custom `Expression`, and shuffle over real
  * block transfers.
  *
  * This main runs a query slice twice — `local[32]` and
  * `local-cluster[2,4,4096]` — and compares an order-independent digest
  * (row count, bit_xor of per-row xxhash64, and a mod-p sum of the same
  * hash). All registered queries have integer-exact outputs (the
  * repo-wide oracle convention), so the digests must match BIT-FOR-BIT
  * across the two masters; a mismatch means some result depends on the
  * execution topology (per-JVM state, driver-local paths,
  * partition-count-sensitive folds, unstable seed plumbing) — the
  * first full-suite run caught exactly that: the stateful interpreter
  * simulators defaulted partitions to defaultParallelism, fixed via
  * `Synth.pinnedPartitions`.
  *
  * The default slice covers each machinery family once: scan+agg (q01),
  * broadcast join (q02), window top-k (q03), sessionize (q06), synth
  * fast path and interpreter seed plumbing (g56/g76/g82), MinHash-LSH
  * banding + self-join (g46), skew salting (g59/g60), iterative
  * pointer-jumping (q88), PPJoin (q98), the custom as-of physical
  * operator (q91 — a custom SparkPlan actually executing on remote
  * executors), the DataSource V2 hash-IVF index serve (g110) and its
  * incremental append (g115), sampling/splits (q45), and three
  * streaming replays whose state stores (incl. RocksDB
  * transformWithState) live on the forked executors (g55/g102/g103).
  * `all` runs the entire registered suite.
  *
  * Usage: `graft.tools.ClusterParityCheck [sfDir] [q1,q2,...|all]`
  * Requires SPARK_HOME/SPARK_SCALA_VERSION in the env for the
  * local-cluster executors. Prints one JSON line; exits 1 on any
  * digest mismatch.
  */
object ClusterParityCheck {

  private val DefaultSlice = Seq(
    "q01_agg_pricing", "q02_join_regions", "q03_topk_orders",
    "q06_sessionize", "q45_hash_split", "q88_pagerank", "q91_asof_native",
    "q98_setsim_join", "g46_minhash_lsh", "g56_fastpath_bits",
    "g59_salted_agg", "g60_salted_join", "g76_scalar_bits", "g82_iot_bits",
    "g110_ann_hash_ivf", "g115_ann_index_append",
    // streaming replays: state stores (incl. RocksDB transformWithState)
    // live on the forked executors; the memory-sink results must still
    // be bit-identical to the single-JVM run
    "g55_stream_counts", "g102_stream_tws_profile",
    "g103_stream_session_window")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = ParityHarness.resolveNames(args.lift(1), DefaultSlice)
    val passes = Seq(
      "local" -> ParityHarness.runPass("local[32]", Map.empty, sfDir, names),
      "cluster" -> ParityHarness.runPass("local-cluster[2,4,4096]",
        Map.empty, sfDir, names))
    if (ParityHarness.report("cluster_parity", sfDir, names, passes) > 0)
      sys.exit(1)
  }
}
