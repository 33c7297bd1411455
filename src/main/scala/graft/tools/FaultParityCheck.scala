package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

/** Fault-tolerance parity proof — the third leg after
  * [[ClusterParityCheck]] (topology) and [[ConfParityCheck]] (tuning).
  *
  * On a 1000-executor cluster, task retries and speculative duplicate
  * attempts are not rare events, they are the steady state. Spark's
  * recovery model assumes every task is deterministic and idempotent:
  * a retried generator task must reproduce the same rows, and a
  * side-effecting task (the shard sink's temp files, the Avro writer,
  * an ANN index partition write) must tolerate a killed first attempt
  * or a concurrent duplicate attempt without corrupting the output.
  * The repo CLAIMS all of this (data-derived seeding, per-attempt temp
  * names, rename-commit protocols) — this main injects the failures
  * and checks the bytes.
  *
  * Passes, each digesting every query and comparing against baseline:
  *
  *   - `baseline` — the standard local[32] session;
  *   - `killretry` — a [[SparkListener]] calls
  *     `SparkContext.killTaskAttempt` on the FIRST attempt of every
  *     k-th task (taskId % k == 0), forcing the scheduler to re-run it;
  *     a task whose retry produces different rows, or whose first
  *     attempt left partial side effects behind, breaks the digest.
  *     The kill is non-interrupting, so the doomed attempt keeps
  *     executing until its next kill-check WHILE the retry runs — the
  *     two attempts genuinely overlap, exercising the same
  *     duplicate-attempt surface (temp-file collisions, commit races)
  *     that speculative execution produces on a real cluster.
  *
  * A speculation-storm pass (spark.speculation with quantile 0) was
  * investigated and is structurally impossible on one machine: the
  * scheduler marks stragglers speculatable but
  * `TaskSetManager.dequeueSpeculativeTask` refuses to launch a copy on
  * a host that already has an attempt, and every local / local-cluster
  * executor reports the same host. Concurrent-duplicate safety is
  * therefore covered by the overlap above plus the writers' unit tests
  * (per-attempt temp names in the Avro writer and shard sink).
  *
  * The injected-kill count is reported per pass so a green run is
  * evidenced, not vacuous.
  *
  * Usage: `graft.tools.FaultParityCheck [sfDir] [q1,q2,...|all]`
  * Prints one JSON line; exits 1 on any digest mismatch.
  */
object FaultParityCheck {

  /** Kills the first attempt of every k-th task. `killTaskAttempt`
    * throws if the task already finished — quick tasks simply escape,
    * which is fine: chaos is probabilistic, and the KILLED count in the
    * report shows how much of it actually landed. Interrupt is false so
    * the kill takes effect at the task's next kill-check rather than
    * interrupting mid-IO (interruption noise would test the JDK's
    * channel handling, not our determinism).
    */
  private final class KillChaos(sc: SparkContext, k: Int) extends SparkListener {
    val killed = new AtomicLong
    override def onTaskStart(t: SparkListenerTaskStart): Unit = {
      val info = t.taskInfo
      if (info.attemptNumber == 0 && info.taskId % k == 0) {
        try {
          if (sc.killTaskAttempt(info.taskId, interruptThread = false,
              reason = "fault-parity chaos")) {
            killed.incrementAndGet(); ()
          }
        } catch { case _: Exception => () }
      }
    }
  }

  /** Counts attempts beyond the first — speculative duplicates and
    * retries — so the speculation pass can prove it actually speculated.
    */
  private final class AttemptCounter extends SparkListener {
    val extraAttempts = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskInfo.attemptNumber > 0) { extraAttempts.incrementAndGet(); () }
  }

  private def session(master: String, confs: Map[String, String]): SparkSession = {
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
        .config("spark.executor.extraClassPath",
          sys.props.getOrElse("graft.classes",
            "/root/repo/target/scala-2.13/classes"))
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.executor.memory", "3g")
      else b
    val s = confs.foldLeft(b2) { case (bb, (k, v)) => bb.config(k, v) }
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR") // kill/retry WARNs would flood the log
    s
  }

  private def runPass(master: String, confs: Map[String, String], chaosEveryK: Int,
      sfDir: String, names: Seq[String])
      : (Map[String, Either[String, ClusterParityCheck.Digest]], Long) = {
    graft.SynthQueries.clearIndexCache()
    val spark = session(master, confs)
    val sc = spark.sparkContext
    val counter = new AttemptCounter
    sc.addSparkListener(counter)
    val chaos = if (chaosEveryK > 0) {
      val c = new KillChaos(sc, chaosEveryK); sc.addSparkListener(c); Some(c)
    } else None
    try {
      spark.range(1000).agg(org.apache.spark.sql.functions.sum("id")).collect()
      val res = names.map { n =>
        val fn = graft.SparkEntry.queries.getOrElse(n,
          sys.error(s"unknown query: $n"))
        n -> (try Right(ClusterParityCheck.digest(fn(spark, sfDir)))
        catch {
          case e: Throwable =>
            Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        })
      }.toMap
      val injected = chaos.map(_.killed.get).getOrElse(counter.extraAttempts.get)
      (res, injected)
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

    val passes: Seq[(String, String, Map[String, String], Int)] = Seq(
      ("baseline", "local[32]", Map.empty[String, String], 0),
      ("killretry", "local[32]", Map.empty[String, String], 5))

    val results = passes.map { case (label, master, confs, k) =>
      val (res, injected) = runPass(master, confs, k, sfDir, names)
      (label, res, injected)
    }
    val base = results.head._2

    var bad = 0
    val per = names.map { n =>
      def side(e: Either[String, ClusterParityCheck.Digest]) = e match {
        case Right(d)  => d.render
        case Left(err) => s""""ERR: ${err.replace("\"", "'")}""""
      }
      val cells = results.map { case (label, m, _) =>
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
    val injectedJson = results.map { case (l, _, i) => s""""$l":$i""" }.mkString(",")
    println(s"""{"metric":"fault_parity","sf":"$sfDir","n":${names.size},""" +
      s""""mismatches":$bad,"injected":{$injectedJson},""" +
      s""""queries":{${per.mkString(",")}}}""")
    if (bad > 0) sys.exit(1)
  }
}
