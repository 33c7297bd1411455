package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Second `transformWithState` processor (ListState this time, where
  * [[TypeCountProcessor]] exercises MapState): per user, keep only the
  * K LATEST events in a bounded ListState — the state never exceeds K
  * entries no matter how long the stream runs — and emit them ranked
  * (1 = newest) when the flush timer fires. Ordering ties break by
  * event id, so the emitted ranking is deterministic regardless of
  * arrival interleaving.
  */
class LatestKProcessor(k: Int)
    extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long, Long, Long)] {
  @transient private var latest: ListState[(Long, Long)] = _
  @transient private var pendingTimer: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    latest = getHandle.getListState[(Long, Long)]("latest",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
    pendingTimer = getHandle.getValueState[Long]("pending_timer",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
      timers: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    // merge batch rows into the bounded buffer: keep the K newest by
    // (ts desc, event_id desc)
    val merged = (latest.get().toSeq ++ rows.map(r => (r._2, r._3)))
      .sortBy { case (ts, id) => (-ts, -id) }
      .take(k)
    latest.put(merged.toArray)
    // one live timer per key, moved forward only (see TypeCountProcessor:
    // a stale timer firing between batches would emit a truncated
    // latest-K and clear state mid-stream)
    val newExpiry = merged.headOption.map(_._1 + 1L).getOrElse(1L)
    val pending = if (pendingTimer.exists()) pendingTimer.get() else Long.MinValue
    if (newExpiry > pending) {
      if (pending != Long.MinValue) getHandle.deleteTimer(pending)
      getHandle.registerTimer(newExpiry)
      pendingTimer.update(newExpiry)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
    val out = latest.get().toSeq.sortBy { case (ts, id) => (-ts, -id) }
      .zipWithIndex
      .map { case ((ts, id), i) => (key, i + 1L, id, ts) }
    latest.clear()
    pendingTimer.clear()
    out.iterator
  }
}
