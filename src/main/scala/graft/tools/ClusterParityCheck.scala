package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType

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
  * This main runs a representative query slice twice — `local[32]` and
  * `local-cluster[2,4,4096]` — and compares an order-independent digest
  * (row count, bit_xor of per-row xxhash64, and a mod-p sum of the same
  * hash). All chosen queries have integer-exact outputs (the repo-wide
  * oracle convention), so the digests must match BIT-FOR-BIT across the
  * two masters; a mismatch means some result depends on the execution
  * topology (per-JVM state, driver-local paths, partition-count-sensitive
  * float folds, unstable seed plumbing).
  *
  * The slice covers each machinery family once: scan+agg (q01), broadcast
  * join (q02), window top-k (q03), sessionize (q06), synth fast path and
  * interpreter seed plumbing (g56/g76/g82), MinHash-LSH banding +
  * self-join (g46), skew salting (g59/g60), iterative pointer-jumping
  * (q88), PPJoin (q98), the custom as-of physical operator (q91 — a
  * custom SparkPlan actually executing on remote executors), the
  * DataSource V2 hash-IVF index serve (g110), sampling/splits (q45),
  * and three streaming replays whose state stores (incl. RocksDB
  * transformWithState) live on the forked executors (g55/g102/g103).
  *
  * Usage: `graft.tools.ClusterParityCheck [sfDir] [q1,q2,...]`
  * Prints one JSON line; exits 1 on any digest mismatch.
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

  final case class Digest(rows: Long, xor: Long, sum: Long) {
    def render: String = s"""{"rows":$rows,"xor":$xor,"sum":$sum}"""
  }

  /** Order-independent exact digest. Maps are cast to string (xxhash64
    * rejects MapType); everything else hashes natively. pmod keeps the
    * sum far from Long overflow under ANSI arithmetic.
    */
  def digest(df: DataFrame): Digest = {
    val cols = df.schema.fields.toSeq.map { f =>
      f.dataType match {
        case _: MapType => col(f.name).cast("string")
        case _          => col(f.name)
      }
    }
    val r = df
      .select(xxhash64(cols: _*).as("h"))
      .agg(
        count(lit(1)).as("n"),
        expr("bit_xor(h)").as("x"),
        sum(pmod(col("h"), lit(1000000007L))).as("s"))
      .collect()(0)
    Digest(r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1),
      if (r.isNullAt(2)) 0L else r.getLong(2))
  }

  private def session(master: String): SparkSession = {
    val addOpens = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED").mkString(" ")
    val b = SparkSession.builder()
      .withExtensions(new graft.expr.GraftExtensions)
      .master(master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val b2 =
      if (master.startsWith("local-cluster")) b
        // forked executor JVMs need the graft classes (task closures and
        // custom Expressions deserialize there) and the JDK-17 opens
        .config("spark.executor.extraClassPath",
          sys.props.getOrElse("graft.classes",
            "/root/repo/target/scala-2.13/classes"))
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.executor.memory", "3g")
      else b
    val s = b2.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def runSlice(master: String, sfDir: String, names: Seq[String])
      : Map[String, Either[String, Digest]] = {
    // each master must BUILD its own ANN indexes, not serve the other
    // pass's memoized directories — otherwise the index write path is
    // never exercised across process boundaries
    graft.SynthQueries.clearIndexCache()
    val spark = session(master)
    try {
      // one tiny action first so executor registration / codegen warm-up
      // isn't attributed to the first query
      spark.range(1000).agg(sum("id")).collect()
      names.map { n =>
        val fn = graft.SparkEntry.queries.getOrElse(n,
          sys.error(s"unknown query: $n"))
        n -> (try Right(digest(fn(spark, sfDir)))
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
    // "all" = the entire registered suite (batch first, streaming last —
    // the Bench hygiene ordering)
    val names = args.lift(1) match {
      case Some("all") =>
        val (st, ba) = graft.SparkEntry.queries.keys.toSeq.sorted
          .partition(_.contains("_stream"))
        ba ++ st
      case Some(csv) => csv.split(",").toSeq.map(_.trim)
      case None      => DefaultSlice
    }

    val localRes = runSlice("local[32]", sfDir, names)
    val clusterRes = runSlice("local-cluster[2,4,4096]", sfDir, names)

    var bad = 0
    val per = names.map { n =>
      val (l, c) = (localRes(n), clusterRes(n))
      val ok = (l, c) match {
        case (Right(a), Right(b)) => a == b
        case _                    => false
      }
      if (!ok) bad += 1
      def side(e: Either[String, Digest]) = e match {
        case Right(d)  => d.render
        case Left(err) => s""""ERR: ${err.replace("\"", "'")}""""
      }
      s""""$n":{"match":$ok,"local":${side(l)},"cluster":${side(c)}}"""
    }
    println(s"""{"metric":"cluster_parity","sf":"$sfDir","n":${names.size},""" +
      s""""mismatches":$bad,"queries":{${per.mkString(",")}}}""")
    if (bad > 0) sys.exit(1)
  }
}
