package graft.synth

import org.apache.spark.sql.types.DataType

import scala.collection.mutable

/** Per-task generation context: one sequential RNG stream per Spark
  * partition (seeded from (seed, partitionId) — bit-reproducible under any
  * scheduling, see graft.runtime.Rng), the current row id, and a
  * per-record side channel for cross-field coupling (the reference's
  * NameSampler.previousName → email-name handoff,
  * EmailNameSampler.java:170-178).
  */
final class GenContext(val rng: java.util.Random, var rowId: Long) {
  val side: mutable.Map[String, Any] = mutable.Map.empty
  def newRecord(id: Long): Unit = { rowId = id; side.clear() }
}

/** A compiled sampler: knows its Catalyst DataType statically (unlike the
  * reference, which infers the record schema from a sampled row —
  * DataSynthesizerBase.java:176-207) and produces one Spark-external
  * value per call. State lives in instance fields; instances are built
  * fresh inside each task (per-partition state, the analog of the
  * reference's per-thread ThreadLocal samplers).
  */
trait Sampler extends Serializable {
  def dataType: DataType
  def sample(ctx: GenContext): Any

  /** Per-record state reset — the reference's restart() contract
    * (SchemaSampler.java:160-164): random walks restart from `start` for
    * each output record, while progressive clocks (event arrivals, CRPs)
    * intentionally persist. Composite samplers forward to children.
    */
  def restart(): Unit = ()
}
