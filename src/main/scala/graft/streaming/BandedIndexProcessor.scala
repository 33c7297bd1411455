package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** Streaming near-duplicate index with BATCH-EQUAL recall — the
  * full-index upgrade of [[BandedFirstSeenProcessor]].
  *
  * Why it exists (r10): the one-survivor-per-bucket design's recall
  * collapses once bucket occupancy passes 1 — measured by
  * tools/BandedRecallBench at hamming <= 3 over random 64-bit
  * signatures: miss rate 4% at 16k corpus (occupancy 0.25), 20% at 64k
  * (1.0), 91% at 1M (16), because an unrelated earlier signature owns
  * the shared bucket and the near-dup pair never meets. This processor
  * keeps EVERY distinct signature's first (id, sig) in the bucket's
  * ListState instead of only the first arriver, so a later near-dup
  * always finds its earlier partner in the pigeonhole-guaranteed
  * shared band: recall 1.0, exactly the batch
  * [[graft.ops.Dedup.bandedHammingPairs]] semantics, incrementally.
  *
  * The honest costs, stated plainly:
  *  - state: one (id, sig) pair per (band, DISTINCT signature) — the
  *    (k+1)-longs-per-distinct-signature bound, linear in corpus like
  *    any dedup index, partitioned by the state-store shuffle;
  *  - compute: each arrival scans its bucket's list — expected
  *    occupancy = distinctSigs / 2^(64/(k+1)) per band (for 16-bit
  *    bands that passes 1 only beyond ~65k distinct signatures per
  *    state partition at 100 TB the store shards this);
  *  - exact re-arrivals of an already-indexed signature are matched
  *    but NOT appended, so duplicates never grow state.
  *
  * Emission per (arrival, band): the min verifying earlier id in that
  * bucket, else -1; the downstream keyed min over bands equals the
  * batch pass's min matched partner.
  */
class BandedIndexProcessor(maxHamming: Int)
    extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long)] {
  require(maxHamming >= 1 && maxHamming <= 7,
    s"maxHamming must be in [1, 7] (got $maxHamming); 0 is exact dedup — " +
      "use FirstSeenProcessor, whose key IS the signature")

  @transient private var entries: ListState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    entries = getHandle.getListState[(Long, Long)]("entries",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
  }

  /** MEMORY BOUND: one band-bucket's micro-batch rows are buffered and
    * sorted (the FirstSeenProcessor contract), plus the bucket's
    * distinct-signature list is held while scanning — both are one
    * bucket's share, not the batch's.
    */
  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
      timers: TimerValues): Iterator[(Long, Long)] = {
    val buf = rows.toArray.sortBy(r => (r._1, r._2))
    val idx = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    entries.get().foreach(idx += _)
    val appended = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val out = buf.iterator.map { case (_, id, sig) =>
      var best = -1L
      var exact = false
      var i = 0
      while (i < idx.length) {
        val (eid, esig) = idx(i)
        if (esig == sig) exact = true
        if (java.lang.Long.bitCount(sig ^ esig) <= maxHamming &&
          (best < 0 || eid < best)) best = eid
        i += 1
      }
      if (!exact) {
        idx += ((id, sig))
        appended += ((id, sig))
      }
      (id, best)
    }.toArray // force: state writes must happen inside this call
    if (appended.nonEmpty) entries.appendList(appended.toArray)
    out.iterator
  }
}
