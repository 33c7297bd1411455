package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskStart}

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
  * The `killretry` pass attaches a [[SparkListener]] that calls
  * `SparkContext.killTaskAttempt` on the FIRST attempt of every k-th
  * task (taskId % k == 0), forcing the scheduler to re-run it; a task
  * whose retry produces different rows, or whose first attempt left
  * partial side effects behind, breaks the digest. The kill is
  * non-interrupting, so the doomed attempt keeps executing until its
  * next kill-check WHILE the retry runs — the two attempts genuinely
  * overlap, exercising the same duplicate-attempt surface (temp-file
  * collisions, commit races) that speculative execution produces on a
  * real cluster.
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
  * The injected-kill count is reported so a green run is evidenced,
  * not vacuous.
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

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = ParityHarness.resolveNames(
      args.lift(1).orElse(Some("all")), Seq.empty)

    val baseline = ParityHarness.runPass("local[32]", Map.empty, sfDir, names)
    var chaos: KillChaos = null
    val killretry = ParityHarness.runPass("local[32]", Map.empty, sfDir, names,
      onSession = sc => { chaos = new KillChaos(sc, 5); sc.addSparkListener(chaos) })

    val bad = ParityHarness.report("fault_parity", sfDir, names,
      Seq("baseline" -> baseline, "killretry" -> killretry),
      extraJson = s""""injected":{"killretry":${chaos.killed.get}}""")
    if (bad > 0) sys.exit(1)
  }
}
