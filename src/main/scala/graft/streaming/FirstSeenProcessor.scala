package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming dedup-index processor: per key (a content signature — an
  * exact fingerprint, a dHash, a MinHash bucket), remember the FIRST
  * row that carried it and attribute every later row to that survivor.
  * This is the incremental form of the batch keep-first dedup (q21):
  * each arriving item gets its decision EMITTED IMMEDIATELY in the same
  * micro-batch (dup_of = -1 for the canonical first, the survivor's id
  * otherwise) instead of waiting for a window flush, which is exactly
  * what a crawl-loop needs — route new documents, drop dups, never
  * re-shuffle history.
  *
  * State is one long per DISTINCT key — the minimal dedup index; at
  * 100 TB that is the size of the unique-content set, the same bound
  * the batch index carries, partitioned by the state-store shuffle. No
  * timers, TimeMode.None: the decision never depends on event time
  * beyond the (ts, id) sort that makes intra-batch order deterministic.
  *
  * Input rows are (key, ts, id); output (id, key, dup_of).
  */
class FirstSeenProcessor
    extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long, Long)] {
  @transient private var first: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    first = getHandle.getValueState[Long]("first",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  /** MEMORY BOUND (the documented buffer contract): `rows.toArray`
    * materializes ONE key's rows of ONE micro-batch on the executor —
    * O(hottest key x batch size), never the whole batch or the key's
    * history. Operators size micro-batches (maxFilesPerTrigger /
    * maxOffsetsPerTrigger) so a hot key's per-batch share fits; a
    * 200k-row single-key batch is exercised in SkewedKeySpec. The sort
    * exists only to pin intra-batch order to (ts, id) — feeds that
    * pre-sort within partitions could stream instead, but Spark gives
    * no row-order guarantee into handleInputRows, so the buffer is the
    * portable contract.
    */
  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
      timers: TimerValues): Iterator[(Long, Long, Long)] = {
    // sort WITHIN the batch; the replay's id-ordered splits guarantee
    // order across batches (a key's earlier rows land in earlier files)
    val buf = rows.toArray.sortBy(r => (r._2, r._3))
    buf.iterator.map { case (_, _, id) =>
      if (!first.exists()) {
        first.update(id)
        (id, key, -1L)
      } else (id, key, first.get())
    }
  }
}
