package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming WARC revisit resolution — the continuous form of
  * [[graft.ops.Revisit.resolve]]: in a live crawl ingest, revisit
  * stubs and the responses that carry their bytes arrive in DIFFERENT
  * micro-batches, in either order (segment arrival is not payload
  * order). State keys by payload digest and carries:
  *
  *   canon   = the digest's canonical original (record id, payload) —
  *             first response to arrive claims it
  *   pending = revisit record ids seen BEFORE any original (the
  *             out-of-order buffer), flushed the moment one lands
  *
  * Responses emit immediately (revisit_of null); a revisit emits the
  * canonical original's id + payload when one is known, else buffers.
  * A digest whose original never arrives keeps its revisits pending
  * forever — they are simply absent from the output, the streaming
  * analog of the batch op's null payload.
  *
  * Determinism: within a (digest, batch) group rows process in
  * (warc_type, record_id) order — responses sort before revisits, so
  * a same-batch pair resolves immediately and identically on every
  * run; ACROSS batches the output set is order-free because a digest
  * has one canonical original in a well-formed crawl (and first-wins
  * makes a violated invariant deterministic per batch layout).
  *
  * Scale note, stated plainly: state carries one PAYLOAD per distinct
  * digest — the dedup corpus itself, on RocksDB. A crawl-scale
  * deployment would store a CDX pointer (segment, offset, length)
  * instead and re-fetch bytes at sink time ([[graft.sources
  * .WarcRandomAccess]] is that seam); the state shape and resolution
  * logic are unchanged, which is why the rig stores bytes.
  */
class RevisitProcessor
    extends StatefulProcessor[String, (String, String, String, Array[Byte]),
      (String, String, Array[Byte])] {

  @transient private var canon: ValueState[(String, Array[Byte])] = _
  @transient private var pending: ListState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    canon = getHandle.getValueState[(String, Array[Byte])]("canon",
      Encoders.tuple(Encoders.STRING, Encoders.BINARY), TTLConfig.NONE)
    pending = getHandle.getListState[String]("pending", Encoders.STRING,
      TTLConfig.NONE)
  }

  /** Input rows: (digest, warc_type, record_id, payload). MEMORY
    * BOUND: one digest's rows of one micro-batch buffer and sort —
    * the shared per-key-per-batch contract; a digest's per-batch row
    * count is its duplicate multiplicity in that segment.
    */
  override def handleInputRows(key: String,
      rows: Iterator[(String, String, String, Array[Byte])],
      timers: TimerValues): Iterator[(String, String, Array[Byte])] = {
    val buf = rows.toArray.sortBy(r => (r._2, r._3))
    val out = Seq.newBuilder[(String, String, Array[Byte])]
    buf.foreach { case (_, warcType, rid, payload) =>
      if (warcType == "response") {
        if (!canon.exists()) {
          canon.update((rid, payload))
          // flush the out-of-order buffer
          val waiting = pending.get()
          while (waiting.hasNext) out += ((waiting.next(), rid, payload))
          pending.clear()
        }
        out += ((rid, null, payload))
      } else { // revisit
        if (canon.exists()) {
          val (oid, opayload) = canon.get()
          out += ((rid, oid, opayload))
        } else pending.appendValue(rid)
      }
    }
    out.result().iterator
  }
}
