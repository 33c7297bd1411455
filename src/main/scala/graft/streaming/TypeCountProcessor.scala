package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

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

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, String)],
      timers: TimerValues): Iterator[(Long, String, Long)] = {
    var maxMs = 0L
    rows.foreach { case (_, tsMs, tpe) =>
      counts.updateValue(tpe,
        (if (counts.containsKey(tpe)) counts.getValue(tpe) else 0L) + 1L)
      if (tsMs > maxMs) maxMs = tsMs
    }
    // one flush per key: (re)register just past the newest event. A
    // stale timer from an earlier batch fires into already-cleared
    // state and emits nothing, so duplicate registration is harmless.
    getHandle.registerTimer(maxMs + 1L)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[(Long, String, Long)] = {
    val out = counts.iterator().map { case (tpe, n) => (key, tpe, n) }.toArray
    counts.clear()
    out.iterator
  }
}
