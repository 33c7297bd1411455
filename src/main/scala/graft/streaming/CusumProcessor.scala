package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key online CUSUM state: the TWO-SIDED detector
  * `S+_i = max(0, S+_{i-1} + (v_i - target))` and
  * `S-_i = max(0, S-_{i-1} - (v_i - target))`, folded as
  * `S+_i = cum_i - min(0, min_{j<=i} cum_j)` and
  * `S-_i = max(0, max_{j<=i} cum_j) - cum_i` — tracking (cum, rmin,
  * rmax) makes both recursions associative-resumable across
  * micro-batches AND exactly replayable in SQL as a prefix sum against
  * a running min/max. `refSum` carries the optional reference-window
  * accumulation (adaptive baseline — see [[CusumProcessor]]).
  */
case class CusumState(n: Long, cum: Long, rmin: Long, rmax: Long,
    maxS: Long, maxSn: Long, alarmIdx: Long, alarmTs: Long,
    alarmNIdx: Long, alarmNTs: Long, refSum: Long)

object CusumProcessor {
  val Zero: CusumState =
    CusumState(0L, 0L, 0L, 0L, 0L, 0L, -1L, -1L, -1L, -1L, 0L)

  /** One CUSUM step — pure, so the resume-across-batches property
    * (folding a sequence in one batch == folding it split at ANY batch
    * boundaries) is unit-testable without a streaming rig.
    *
    * With `refWindow > 0` the first refWindow observations per key only
    * accumulate the baseline (`refSum`); scoring starts at observation
    * refWindow+1 against `target = floorDiv(refSum, refWindow)` — the
    * self-estimated reference mean. With refWindow = 0 the caller's
    * `targetMicro` is the fixed reference. Indices (`n`, alarm indices)
    * count ALL observations, reference window included.
    */
  def step(s: CusumState, tsNs: Long, vMicro: Long, targetMicro: Long,
      thresholdMicro: Long, refWindow: Long = 0L): CusumState = {
    val n = s.n + 1
    if (n <= refWindow) s.copy(n = n, refSum = s.refSum + vMicro)
    else {
      val tgt =
        if (refWindow > 0) Math.floorDiv(s.refSum, refWindow)
        else targetMicro
      val cum = s.cum + (vMicro - tgt)
      val rmin = math.min(s.rmin, cum)
      val rmax = math.max(s.rmax, cum)
      val score = cum - rmin
      val scoreN = rmax - cum
      val (ai, at) =
        if (s.alarmIdx < 0 && score > thresholdMicro) (n, tsNs)
        else (s.alarmIdx, s.alarmTs)
      val (ani, ant) =
        if (s.alarmNIdx < 0 && scoreN > thresholdMicro) (n, tsNs)
        else (s.alarmNIdx, s.alarmNTs)
      CusumState(n, cum, rmin, rmax, math.max(s.maxS, score),
        math.max(s.maxSn, scoreN), ai, at, ani, ant, s.refSum)
    }
  }
}

/** Streaming changepoint/mean-shift monitor via TWO-SIDED CUSUM over
  * `transformWithState`: per key (metric feed), fold integer deviations
  * from the reference in event order; raise the positive-side alarm at
  * the FIRST index where S+ exceeds `thresholdMicro` (upward mean
  * shift) and the negative-side alarm where S- does (downward shift).
  * The batch q140 estimator answers "where did the mean shift" after
  * the fact; this is its production streaming twin — "tell me DURING
  * ingestion", with O(1) state per key (eleven longs), so state stays
  * bounded by the key set at any corpus scale.
  *
  * The reference is either the caller's fixed `targetMicro`
  * (refWindow = 0: an upstream reference-period broadcast, the g118
  * shape) or SELF-ESTIMATED from the key's first `refWindow`
  * observations (adaptive baseline, the g123 shape — no second pass
  * over the feed, and still SQL-replayable: the target is an integer
  * mean over a row_number window).
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
  * Output: (key, n, max_s, alarm_idx, alarm_ts_ns, max_sn, alarm_n_idx,
  * alarm_n_ts_ns) — alarm fields -1 when that side never crossed.
  */
class CusumProcessor(targetMicro: Long, thresholdMicro: Long,
    refWindow: Long = 0L)
    extends StatefulProcessor[String, (String, Long, Long, Long),
      (String, Long, Long, Long, Long, Long, Long, Long)] {
  @transient private var st: ValueState[CusumState] = _
  @transient private var pendingTimer: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    st = getHandle.getValueState[CusumState]("cusum",
      Encoders.product[CusumState], TTLConfig.NONE)
    pendingTimer = getHandle.getValueState[Long]("pending_timer",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  /** MEMORY BOUND: one key's rows of one micro-batch are buffered and
    * sorted (see FirstSeenProcessor.handleInputRows for the full
    * contract; SkewedKeySpec exercises a 200k-row single-key batch).
    */
  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Long, Long)],
      timers: TimerValues)
      : Iterator[(String, Long, Long, Long, Long, Long, Long, Long)] = {
    // sort WITHIN the batch; across batches the time-thirds replay
    // guarantees order (rows with equal ts always land in one batch)
    val buf = rows.toArray.sortBy(r => (r._2, r._3))
    var s = if (st.exists()) st.get() else CusumProcessor.Zero
    var maxMs = 0L
    buf.foreach { case (_, tsNs, _, vMicro) =>
      s = CusumProcessor.step(s, tsNs, vMicro, targetMicro,
        thresholdMicro, refWindow)
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
      info: ExpiredTimerInfo)
      : Iterator[(String, Long, Long, Long, Long, Long, Long, Long)] = {
    val out =
      if (st.exists()) {
        val s = st.get()
        Iterator.single((key, s.n, s.maxS, s.alarmIdx, s.alarmTs,
          s.maxSn, s.alarmNIdx, s.alarmNTs))
      } else Iterator.empty
    st.clear()
    pendingTimer.clear()
    out
  }
}
