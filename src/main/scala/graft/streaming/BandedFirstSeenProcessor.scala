package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming NEAR-duplicate dedup index — the hamming <= k extension of
  * [[FirstSeenProcessor]], closing the batch/stream gap: batch near-dup
  * uses [[graft.ops.Dedup.bandedHammingPairs]]'s pigeonhole banding;
  * this processor keys state per (band, band-key) so the same banding
  * runs incrementally in a crawl loop.
  *
  * Grouping key: the composite `band * 2^bandBits + bandKey` (each
  * arriving signature is exploded to its k+1 band keys upstream).
  * State: ONE (id, signature) pair per occupied band bucket — the
  * bucket's first arriver, kept forever (the minimal index: at 100 TB
  * it is bounded by (k+1) x distinct-signature count, partitioned by
  * the state-store shuffle). Per arrival and band the processor emits
  * the bucket survivor's id when the FULL signatures verify within
  * `maxHamming` bits, else -1; merging a row's per-band emissions to
  * `min matched survivor, else -1` is one keyed reduce downstream.
  *
  * Recall contract (the honest streaming trade): a pair within
  * `maxHamming` shares a band by pigeonhole, so it is found whenever
  * the earlier member IS its bucket's survivor. A row that loses a
  * bucket race to an unrelated signature (a band-key collision) does
  * not register there, so a LATER near-dup of that row can miss. The
  * per-unrelated-row collision rate is 2^-(64/(k+1)) per band, which
  * means the MISS RATE GROWS WITH BUCKET OCCUPANCY n/2^16 — measured
  * by tools/BandedRecallBench (r10, planted near-dups at hamming 1-3
  * over random signatures): miss 4% at 16k signatures (occupancy
  * 0.25), 20% at 64k (1.0), 64% at 256k (4), 91% at 1M (16). This
  * processor is therefore the O(bucket-count)-state SAMPLE dedup —
  * right when a bounded state footprint matters more than recall.
  * When recall must match the batch pass at any corpus size, use
  * [[BandedIndexProcessor]] (every distinct signature kept per bucket,
  * state linear in distinct signatures, recall 1.0 — the g124 query).
  * The batch pass stays the exactness backstop; the g122 oracle
  * replays this processor's exact semantics (bucket survivor = min id
  * per band key), not idealized recall.
  *
  * Input rows (ts, id, sig) grouped by composite band key; output
  * (id, candidateSurvivorId | -1), one row per (arrival, band).
  */
class BandedFirstSeenProcessor(maxHamming: Int)
    extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long)] {
  require(maxHamming >= 1 && maxHamming <= 7,
    s"maxHamming must be in [1, 7] (got $maxHamming); 0 is exact dedup — " +
      "use FirstSeenProcessor, whose key IS the signature")

  @transient private var first: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    first = getHandle.getValueState[(Long, Long)]("first",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
  }

  /** MEMORY BOUND: one band-bucket's rows of one micro-batch are
    * buffered and sorted (see FirstSeenProcessor.handleInputRows for
    * the full contract) — note the banding explode upstream multiplies
    * the feed by k+1, but each bucket sees only its own share.
    */
  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
      timers: TimerValues): Iterator[(Long, Long)] = {
    // sort WITHIN the batch; the replay's id-ordered splits guarantee
    // order across batches (same contract as FirstSeenProcessor)
    val buf = rows.toArray.sortBy(r => (r._1, r._2))
    buf.iterator.map { case (_, id, sig) =>
      if (!first.exists()) {
        first.update((id, sig))
        (id, -1L)
      } else {
        val (fid, fsig) = first.get()
        if (java.lang.Long.bitCount(sig ^ fsig) <= maxHamming) (id, fid)
        else (id, -1L)
      }
    }
  }
}
