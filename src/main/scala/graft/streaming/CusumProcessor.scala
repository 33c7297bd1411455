package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key online CUSUM state: the one-sided detector
  * `S_i = max(0, S_{i-1} + (v_i - target))` folded as
  * `S_i = cum_i - min(0, min_{j<=i} cum_j)` — tracking (cum, rmin) makes
  * the recursion associative-resumable across micro-batches AND exactly
  * replayable in SQL as a prefix sum minus a running minimum.
  */
case class CusumState(n: Long, cum: Long, rmin: Long, maxS: Long,
    alarmIdx: Long, alarmTs: Long)

object CusumProcessor {
  val Zero: CusumState = CusumState(0L, 0L, 0L, 0L, -1L, -1L)

  /** One CUSUM step — pure, so the resume-across-batches property
    * (folding a sequence in one batch == folding it split at ANY batch
    * boundaries) is unit-testable without a streaming rig.
    */
  def step(s: CusumState, tsNs: Long, vMicro: Long, targetMicro: Long,
      thresholdMicro: Long): CusumState = {
    val cum = s.cum + (vMicro - targetMicro)
    val rmin = math.min(s.rmin, cum)
    val score = cum - rmin
    val n = s.n + 1
    val (ai, at) =
      if (s.alarmIdx < 0 && score > thresholdMicro) (n, tsNs)
      else (s.alarmIdx, s.alarmTs)
    CusumState(n, cum, rmin, math.max(s.maxS, score), ai, at)
  }
}

/** Streaming changepoint/mean-shift monitor via one-sided CUSUM over
  * `transformWithState`: per key (metric feed), fold integer deviations
  * from a fixed reference `targetMicro` in event order; raise the alarm
  * at the FIRST index where the CUSUM score exceeds `thresholdMicro`.
  * The batch q140 estimator answers "where did the mean shift" after
  * the fact; this is its production streaming twin — "tell me DURING
  * ingestion", with O(1) state per key (six longs), so state stays
  * bounded by the key set at any corpus scale.
  *
  * Input rows are (key, ts_ns, event_id, v_micro); each batch's rows
  * are sorted by (ts_ns, event_id) before folding, and batches arrive
  * time-ordered (the replay splits the feed into time-thirds), so the
  * fold order is the global event order and the emitted summary equals
  * the batch window replay exactly. The final flush rides the same
  * one-live-timer contract as [[TypeCountProcessor]]: exactly one
  * event-time timer per key, moved forward monotonically, fired when
  * the sentinel row advances the watermark past the feed's end.
  *
  * Output: (key, n, max_s, alarm_idx, alarm_ts_ns) — alarm fields -1
  * when the score never crossed the threshold.
  */
class CusumProcessor(targetMicro: Long, thresholdMicro: Long)
    extends StatefulProcessor[String, (String, Long, Long, Long),
      (String, Long, Long, Long, Long)] {
  @transient private var st: ValueState[CusumState] = _
  @transient private var pendingTimer: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    st = getHandle.getValueState[CusumState]("cusum",
      Encoders.product[CusumState], TTLConfig.NONE)
    pendingTimer = getHandle.getValueState[Long]("pending_timer",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Long, Long)],
      timers: TimerValues): Iterator[(String, Long, Long, Long, Long)] = {
    // sort WITHIN the batch; across batches the time-thirds replay
    // guarantees order (rows with equal ts always land in one batch)
    val buf = rows.toArray.sortBy(r => (r._2, r._3))
    var s = if (st.exists()) st.get() else CusumProcessor.Zero
    var maxMs = 0L
    buf.foreach { case (_, tsNs, _, vMicro) =>
      s = CusumProcessor.step(s, tsNs, vMicro, targetMicro, thresholdMicro)
      val ms = tsNs / 1000000L
      if (ms > maxMs) maxMs = ms
    }
    st.update(s)
    // one live timer per key, moved forward monotonically (see
    // TypeCountProcessor for why a stale timer is NOT harmless)
    val newExpiry = maxMs + 1L
    val pending = if (pendingTimer.exists()) pendingTimer.get() else Long.MinValue
    if (newExpiry > pending) {
      if (pending != Long.MinValue) getHandle.deleteTimer(pending)
      getHandle.registerTimer(newExpiry)
      pendingTimer.update(newExpiry)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[(String, Long, Long, Long, Long)] = {
    val out =
      if (st.exists()) {
        val s = st.get()
        Iterator.single((key, s.n, s.maxS, s.alarmIdx, s.alarmTs))
      } else Iterator.empty
    st.clear()
    pendingTimer.clear()
    out
  }
}
