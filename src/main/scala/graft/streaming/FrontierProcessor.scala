package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Continuous crawl-frontier scheduling (r11 verdict ask #5): the
  * batch scheduler ([[graft.ops.Frontier.schedule]]) ranks a CLOSED
  * candidate set; a crawl loop never closes — discovery emits
  * candidates batch after batch, and politeness spacing must carry
  * ACROSS micro-batches. This processor keys state per host and
  * assigns each accepted candidate the host's next free fetch slot:
  *
  *   state per host = (seq, nextFreeS)
  *   arrival (ord, id, delayS) -> emit (id, seq, fetch_at_s = nextFreeS),
  *     then seq += 1, nextFreeS += delayS
  *
  * `delayS` rides on the row (the robots crawl-delay join happens
  * upstream, where it is a broadcast-size dimension), so a host whose
  * published delay CHANGES mid-crawl spaces later fetches by the new
  * value — the state carries the committed timeline, not the policy.
  *
  * Determinism contract (the one every oracle-checked processor in
  * this package shares): arrivals are processed in (ord, id) order
  * within a batch, and the replay's ord-ordered splits guarantee
  * order across batches — so the full schedule replays relationally
  * as a per-host prefix sum of delays in (ord, id) order, which is
  * exactly what the g131 oracle does. State is two longs per host —
  * O(distinct hosts), partitioned by the state-store shuffle; at
  * crawl scale (10^7-10^8 hosts) that is a few GB across a cluster,
  * constant in crawl LENGTH.
  */
class FrontierProcessor
    extends StatefulProcessor[String, (String, Long, Long, Long),
      (Long, String, Long, Long)] {

  @transient private var slot: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    slot = getHandle.getValueState[(Long, Long)]("slot",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
  }

  /** MEMORY BOUND: one host's rows of one micro-batch are buffered and
    * sorted — the shared per-key-per-batch contract; a host's
    * per-batch candidate count is frontier-capped upstream.
    * Input rows: (host, ord, id, delayS).
    */
  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Long, Long)],
      timers: TimerValues): Iterator[(Long, String, Long, Long)] = {
    val buf = rows.toArray.sortBy(r => (r._2, r._3))
    var (seq, nextFree) = if (slot.exists()) slot.get() else (0L, 0L)
    val out = buf.map { case (_, _, id, delayS) =>
      val r = (id, key, seq, nextFree)
      seq += 1
      nextFree += delayS
      r
    }
    slot.update((seq, nextFree))
    out.iterator
  }
}
