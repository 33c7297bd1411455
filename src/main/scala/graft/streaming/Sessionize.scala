package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization over a keyed event stream —
  * the `KeyValueGroupedDataset.flatMapGroupsWithState` surface
  * (SURVEY §2.2 "streaming semantics"): a session closes after
  * `gapSeconds` of event-time silence per key, decided by the
  * watermark (EventTimeTimeout), so results are deterministic under
  * replay and late data inside the watermark is folded in.
  *
  * This is the stateful analog of the batch q06_sessionize query: same
  * gap semantics, incremental O(1) state per key instead of a window
  * over history (no event buffering) — key cardinality is the only
  * scale bound, and the state store shards with the shuffle.
  */
object Sessionize {

  // event_time stays a Timestamp so the watermark tag survives into the
  // stateful operator (projecting it to a long would strip the tag and
  // fail the EventTimeTimeout requirement)
  final case class Event(key: Long, event_time: java.sql.Timestamp) {
    def eventTimeMs: Long = event_time.getTime
  }
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(key: Long, startMs: Long, endMs: Long, nEvents: Long,
      closed: Boolean)

  /** events: a streaming DataFrame with `key` (long) and `event_time`
    * (timestamp) columns. Emits one row per CLOSED session (in-batch
    * splits close immediately; open sessions close when the watermark
    * passes last + gap).
    */
  def sessions(events: DataFrame, gapSeconds: Long): Dataset[Session] = {
    implicit val eventEnc = Encoders.product[Event]
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    val gapMs = gapSeconds * 1000
    val typed = events
      .withWatermark("event_time", s"$gapSeconds seconds")
      .select(col("key").cast("long").as("key"), col("event_time"))
      .as[Event]

    typed
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(key, s.start, s.last, s.n, closed = true))
          } else {
            val ts = rows.map(_.eventTimeMs).toSeq.sorted
            var emitted = List.empty[Session]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // late-but-in-watermark events must never rewind the
                  // session end (that would pull the timeout horizon
                  // earlier and close the session prematurely)
                  cur = Some(s.copy(start = math.min(s.start, t),
                    last = math.max(s.last, t), n = s.n + 1))
                case Some(s) => // silent gap inside the batch: close + reopen
                  emitted ::= Session(key, s.start, s.last, s.n, closed = true)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes the session's gap horizon
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            emitted.reverseIterator
          }
      }
  }
}
