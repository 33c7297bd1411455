package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B calibration for the PPJoin positional filter: candidate-pair
  * count and wall time of the exact set-similarity join with the prefix
  * filter alone vs prefix + positional (the jaccardJoin configuration).
  * Both configurations verify to the SAME exact output (the positional
  * bound only drops pairs that cannot reach the threshold — see
  * SetSimJoin.positionalOk); what changes is how many candidates reach
  * the verification join.
  *
  * Usage: runMain graft.tools.SetSimCalib [sfDir] [tauPpm]
  * Output: one JSON line; paste into COVERAGE.md.
  */
object SetSimCalib {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tauPpm = args.lift(1).map(_.toLong).getOrElse(500000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.expr.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm both paths once so JIT/codegen cost lands on neither side
    graft.ops.SetSimJoin.candidateCount(docs, "doc_id", "text", tauPpm, positional = false)
    graft.ops.SetSimJoin.candidateCount(docs, "doc_id", "text", tauPpm, positional = true)
    val (nPrefix, tPrefix) = timed(graft.ops.SetSimJoin.candidateCount(
      docs, "doc_id", "text", tauPpm, positional = false))
    val (nPos, tPos) = timed(graft.ops.SetSimJoin.candidateCount(
      docs, "doc_id", "text", tauPpm, positional = true))
    val (pairs, tJoin) = timed(graft.ops.SetSimJoin.jaccardJoin(
      docs, "doc_id", "text", tauPpm).count())
    println(
      s"""{"metric":"setsim_calib","sf":"$sfDir","tau_ppm":$tauPpm,""" +
        s""""cand_prefix_only":$nPrefix,"cand_positional":$nPos,""" +
        f""""cand_drop_pct":${100.0 * (nPrefix - nPos) / math.max(1L, nPrefix)}%.1f,""" +
        f""""t_prefix_s":$tPrefix%.2f,"t_positional_s":$tPos%.2f,""" +
        f""""out_pairs":$pairs,"t_full_join_s":$tJoin%.2f}""")
    spark.stop()
  }
}
