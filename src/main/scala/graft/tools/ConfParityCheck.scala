package graft.tools

import org.apache.spark.sql.SparkSession

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
  * All registered queries have integer-exact outputs (the repo-wide
  * oracle convention), so every digest must match bit-for-bit.
  *
  * Usage: `graft.tools.ConfParityCheck [sfDir] [q1,q2,...|all]`
  * Prints one JSON line; exits 1 on any digest mismatch.
  */
object ConfParityCheck {

  private def session(confs: Map[String, String]): SparkSession = {
    val b = SparkSession.builder()
      .withExtensions(new graft.expr.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val s = confs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def runPass(confs: Map[String, String], sfDir: String,
      names: Seq[String]): Map[String, Either[String, ClusterParityCheck.Digest]] = {
    // each pass builds its own ANN indexes — the index WRITE path must be
    // exercised under the perturbed conf too, not just the serve
    graft.SynthQueries.clearIndexCache()
    val spark = session(confs)
    try {
      spark.range(1000).agg(org.apache.spark.sql.functions.sum("id")).collect()
      names.map { n =>
        val fn = graft.SparkEntry.queries.getOrElse(n,
          sys.error(s"unknown query: $n"))
        n -> (try Right(ClusterParityCheck.digest(fn(spark, sfDir)))
        catch {
          case e: Throwable =>
            Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        })
      }.toMap
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1) match {
      case Some("all") | None =>
        val (st, ba) = graft.SparkEntry.queries.keys.toSeq.sorted
          .partition(_.contains("_stream"))
        ba ++ st
      case Some(csv) => csv.split(",").toSeq.map(_.trim)
    }

    val passes: Seq[(String, Map[String, String])] = Seq(
      "baseline" -> Map.empty,
      "shuffle7" -> Map(
        "spark.sql.shuffle.partitions" -> "7",
        "spark.sql.adaptive.enabled" -> "false"),
      "smallsplits" -> Map(
        "spark.sql.files.maxPartitionBytes" -> "1m",
        "spark.sql.files.openCostInBytes" -> "0"))

    val results = passes.map { case (label, confs) =>
      label -> runPass(confs, sfDir, names)
    }
    val base = results.head._2

    var bad = 0
    val per = names.map { n =>
      def side(e: Either[String, ClusterParityCheck.Digest]) = e match {
        case Right(d)  => d.render
        case Left(err) => s""""ERR: ${err.replace("\"", "'")}""""
      }
      val cells = results.map { case (label, m) =>
        val ok = (base(n), m(n)) match {
          case (Right(a), Right(b)) => a == b
          case _                    => false
        }
        (label, m(n), ok)
      }
      val allOk = cells.forall(_._3)
      if (!allOk) bad += 1
      s""""$n":{"match":$allOk,${cells.map { case (l, d, _) =>
        s""""$l":${side(d)}""" }.mkString(",")}}"""
    }
    println(s"""{"metric":"conf_parity","sf":"$sfDir","n":${names.size},""" +
      s""""mismatches":$bad,"queries":{${per.mkString(",")}}}""")
    if (bad > 0) sys.exit(1)
  }
}
