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

  /** State reset, invoked by CONTAINERS on their children — never by the
    * top-level record loop (the reference's SchemaSampler.sample() does
    * not restart during generation, SchemaSampler.java:87-129; a
    * sequence restarts its repeated base before every array sample,
    * SequenceSampler.java:131-138). So a top-level random-walk drifts
    * cumulatively across records, while one embedded in a sequence
    * resets per record; progressive clocks and CRPs leave restart() a
    * no-op either way. Composite samplers forward to children.
    */
  def restart(): Unit = ()
}
