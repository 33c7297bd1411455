package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** [[BandedIndexProcessor]] with a BOUNDED RECALL WINDOW — the
  * eviction story an unbounded crawl needs (VERDICT r10 item 6: the
  * full index's ListState grows linearly in distinct signatures
  * forever; TTLConfig.NONE was an honest gap).
  *
  * Why the window is EVENT-ORDINAL, not wall-clock TTL: a
  * processing-time TTL expires state on executor wall time, so the
  * output depends on scheduling — unreplayable by construction, no
  * oracle can check it, and a backfilled or replayed stream would
  * dedup differently than the live one. Keying expiry to the DATA
  * (each arrival carries a monotone ordinal — fetch sequence number,
  * event-time micros) makes the contract exact: an arrival matches
  * exactly the index entries whose ordinal is within `windowOrd` of
  * its own, under ANY trigger layout, restart, or replay. "Dedup
  * against the last W fetches" is also the semantics a crawl loop
  * actually wants — a re-crawl after the window is a fresh capture.
  *
  * Mechanics per bucket (band-key group):
  *  - every arrival (ord, id, sig) is matched against entries with
  *    `entryOrd >= ord - windowOrd` (per-arrival predicate — exact
  *    regardless of where batch boundaries land), emitting the min
  *    qualifying earlier id, else -1;
  *  - every arrival is then appended (arrivals, not distinct sigs:
  *    membership = "the last windowOrd of traffic", which keeps the
  *    oracle a pure window join rather than a recursive
  *    liveness-of-the-creating-entry computation);
  *  - entries older than `batchMaxOrd - windowOrd` are physically
  *    dropped after the batch. This is lossless as long as ordinals
  *    are non-decreasing ACROSS triggers per bucket (a monotone fetch
  *    counter or watermarked event time gives this; the per-arrival
  *    match predicate is exact even when they are not — only the
  *    PHYSICAL drop assumes monotonicity).
  *
  * State bound: at most the arrivals of one window per bucket —
  * O(windowOrd / 2^16) expected per band bucket, CONSTANT in corpus
  * size; the unbounded/windowed trade is measured by
  * tools/BandedIndexScaleBench's window leg.
  */
class BandedWindowIndexProcessor(maxHamming: Int, windowOrd: Long)
    extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long)] {
  require(maxHamming >= 1 && maxHamming <= 7,
    s"maxHamming must be in [1, 7] (got $maxHamming)")
  require(windowOrd > 0, s"windowOrd must be positive (got $windowOrd)")

  @transient private var entries: ListState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    entries = getHandle.getListState[(Long, Long, Long)]("entries",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE) // expiry is data-driven, not wall-clock (see above)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
      timers: TimerValues): Iterator[(Long, Long)] = {
    // (ord, id, sig) in deterministic arrival order
    val buf = rows.toArray.sortBy(r => (r._1, r._2))
    if (buf.isEmpty) return Iterator.empty
    val idx = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    entries.get().foreach(idx += _)
    val out = buf.iterator.map { case (ord, id, sig) =>
      var best = -1L
      var i = 0
      while (i < idx.length) {
        val (eord, eid, esig) = idx(i)
        if (eord >= ord - windowOrd &&
          java.lang.Long.bitCount(sig ^ esig) <= maxHamming &&
          (best < 0 || eid < best)) best = eid
        i += 1
      }
      idx += ((ord, id, sig))
      (id, best)
    }.toArray // force: state writes must happen inside this call
    val cutoff = buf(buf.length - 1)._1 - windowOrd
    val kept = idx.filter(_._1 >= cutoff)
    if (kept.length == idx.length) {
      // nothing expired: append only this batch's arrivals
      if (buf.nonEmpty) entries.appendList(buf)
    } else {
      entries.clear()
      if (kept.nonEmpty) entries.appendList(kept.toArray)
    }
    out.iterator
  }
}
