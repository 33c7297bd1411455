package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Spark 4 `transformWithState` (arbitrary stateful processing v2)
  * processor: per-user event-type counts held in `MapState`, flushed by
  * an EVENT-TIME TIMER once the watermark passes the user's newest
  * event — the modern replacement for the flatMapGroupsWithState
  * pattern (streaming/Sessionize.scala), with composable typed state
  * (Value/List/MapState), per-state TTLs, and timers as first-class
  * API instead of a single timeout.
  *
  * Input rows are (user_id, event_time_ms, event_type). Each batch
  * re-registers the key's flush timer just past its newest event; when
  * the watermark overtakes it (the driver query advances it with a
  * far-future sentinel row whose OWN timer never fires), the key emits
  * its (user, type, count) rows and clears state — so state is bounded
  * by the active-user set, and the emitted profile equals the batch
  * GROUP BY exactly.
  */
class TypeCountProcessor
    extends StatefulProcessor[Long, (Long, Long, String), (Long, String, Long)] {
  @transient private var counts: MapState[String, Long] = _
  @transient private var pendingTimer: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    pendingTimer = getHandle.getValueState[Long]("pending_timer",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, String)],
      timers: TimerValues): Iterator[(Long, String, Long)] = {
    var maxMs = 0L
    rows.foreach { case (_, tsMs, tpe) =>
      counts.updateValue(tpe,
        (if (counts.containsKey(tpe)) counts.getValue(tpe) else 0L) + 1L)
      if (tsMs > maxMs) maxMs = tsMs
    }
    // EXACTLY ONE live timer per key, moved forward monotonically: a
    // stale earlier timer is NOT harmless — if the watermark overtakes
    // it while later batches are still adding events, the key flushes in
    // two partial emissions (split counts), diverging from the batch
    // GROUP BY the processor promises. Track the registered expiry in
    // ValueState and delete-before-advance; a batch of only older
    // events (newExpiry <= pending) keeps the pending timer.
    val newExpiry = maxMs + 1L
    val pending = if (pendingTimer.exists()) pendingTimer.get() else Long.MinValue
    if (newExpiry > pending) {
      if (pending != Long.MinValue) getHandle.deleteTimer(pending)
      getHandle.registerTimer(newExpiry)
      pendingTimer.update(newExpiry)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[(Long, String, Long)] = {
    val out = counts.iterator().map { case (tpe, n) => (key, tpe, n) }.toArray
    counts.clear()
    pendingTimer.clear()
    out.iterator
  }
}
