package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.runtime.Rng
import graft.synth.{Compiler, GenContext, Synth}

/** DataSource V2 face of the generator:
  *
  * {{{
  * spark.read.format("graft")
  *   .option("schema", schemaJson)   // the generator DSL
  *   .option("n", "1000000")         // rows (K/M/G suffixes allowed)
  *   .option("seed", "42")           // optional
  *   .option("partitions", "32")     // optional, defaults to parallelism
  *   .load()
  * }}}
  *
  * Scale shape: `planInputPartitions` splits the id range exactly like
  * `Synth.dataFrame`'s `spark.range(n, p)` does, and every partition
  * seeds its RNG from SplitMix64(seed, partitionId) — so the V2 source
  * is bit-identical to the mapPartitions path under the same (seed,
  * partitions), embarrassingly parallel, and safe at any executor
  * count. Column pruning is pushed down (`SupportsPushDownRequiredColumns`):
  * all fields are still SAMPLED (cross-field coupling and stream
  * alignment depend on spec order) but only requested columns are
  * converted and shipped — the scan's ReadSchema narrows like any
  * file source's.
  */
final class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Compiler.structType(Compiler.compileSchema(schemaJson(options)))

  private def schemaJson(options: CaseInsensitiveStringMap): String = {
    val s = options.get("schema")
    require(s != null, "graft source requires a 'schema' option (generator DSL JSON)")
    s
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GraftTable(schemaJson(opts), schema,
      graft.spec.SpecParser.parseSize(Option(opts.get("n")).getOrElse("1000")),
      Option(opts.get("seed")).map(_.toLong).getOrElse(42L),
      Option(opts.get("partitions")).map(_.toInt).getOrElse(0))
  }
}

final class GraftTable(schemaJson: String, tableSchema: StructType, n: Long,
    seed: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"graft($n rows)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(schemaJson, tableSchema, n, seed, partitions,
      Option(options.get("rowsPerBatch")).map(_.toLong).getOrElse(10000L))
}

final class GraftScanBuilder(schemaJson: String, full: StructType, n: Long,
    seed: Long, partitions: Int, rowsPerBatch: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve a deterministic order; an empty projection (count(*))
    // still needs row cadence, handled by an empty-width converter
    required = requiredSchema
  override def build(): Scan =
    new GraftScan(schemaJson, full, required, n, seed, partitions, rowsPerBatch)
}

final class GraftScan(schemaJson: String, full: StructType, required: StructType,
    n: Long, seed: Long, partitions: Int, rowsPerBatch: Long = 10000L)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftScan(n=$n, seed=$seed, cols=${required.fieldNames.mkString(",")})"

  /** Bounded micro-batch replay: each trigger admits up to
    * `rowsPerBatch` more ids until all n are emitted — the V2 face of a
    * deterministic generator stream (the id, not the wall clock, is the
    * offset, so restarts resume exactly and results are
    * batch-boundary-independent: per-ROW keyed RNG, same convention as
    * the rate-source stream).
    *
    * STATELESS schemas only: a stateful sampler (random-walk, event
    * clock, CRP, changer) would carry JVM instance state across the rows
    * of one batch-partition and reset at every boundary — records would
    * then depend on where triggers landed, breaking the exact-restart
    * contract above. Rejected loudly here rather than silently violated;
    * stream stateful schemas through SynthStream.stream (which documents
    * its per-row semantics) or generate them in batch.
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    require(graft.synth.ColumnCompiler.supported(schemaJson),
      "the graft streaming source requires a stateless schema (batch-boundary-" +
        "independent records); stateful samplers carry cross-row state that " +
        "would make output depend on trigger timing")
    new GraftMicroBatchStream(schemaJson, full, required, n, seed, rowsPerBatch)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val p = if (partitions > 0) partitions
      else graft.synth.Synth.pinnedPartitions(n)
    // the same contiguous range split spark.range(0, n, 1, p) produces,
    // so (seed, partitions) → bit-identical output vs Synth.dataFrame;
    // the default mirrors the interpreter's pinned (topology-independent)
    // partition count so both defaulted paths stay bit-equal on any
    // cluster shape
    (0 until p).map { i =>
      // BigInt: i * n overflows Long once p grows with n (the pinned
      // default is ~n/64k, so max(i*n) ~ n^2/64k — wraps silently at
      // n >= ~7.8e11 and emits duplicated/missing id ranges).
      // spark.range's own split does the same exact math, so the
      // bit-parity contract with Synth.dataFrame holds at every n.
      val start = (BigInt(i) * n / p).toLong
      val end = (BigInt(i + 1) * n / p).toLong
      GraftInputPartition(i, start, end): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(schemaJson, full, required, seed)
}

final case class GraftInputPartition(pid: Int, start: Long, end: Long)
    extends InputPartition

final case class GraftOffset(rows: Long) extends Offset {
  override def json(): String = rows.toString
}

/** Micro-batch stream over the id space [0, n): offsets are row counts,
  * so progress is exact, checkpoint-resumable, and independent of
  * timing. RNG is keyed per ROW (Rng.forKey(seed, id)) — batch
  * boundaries can land anywhere without changing any record.
  */
final class GraftMicroBatchStream(schemaJson: String, full: StructType,
    required: StructType, n: Long, seed: Long, rowsPerBatch: Long)
    extends MicroBatchStream {
  private var latest = 0L

  override def initialOffset(): Offset = GraftOffset(0L)
  override def latestOffset(): Offset = {
    latest = math.min(n, latest + rowsPerBatch)
    GraftOffset(latest)
  }
  override def deserializeOffset(json: String): Offset = {
    val rows = json.trim.toLong
    latest = math.max(latest, rows) // resume past a checkpoint
    GraftOffset(rows)
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].rows
    val e = end.asInstanceOf[GraftOffset].rows
    val span = e - s
    if (span <= 0) return Array.empty
    val p = math.min(span, 8L).toInt
    (0 until p).map { i =>
      GraftInputPartition(i, s + i * span / p, s + (i + 1) * span / p): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftStreamReaderFactory(schemaJson, full, required, seed)
}

/** Per-row keyed RNG variant of the batch reader (streaming: records
  * must not depend on which micro-batch emitted them).
  */
final class GraftStreamReaderFactory(schemaJson: String, full: StructType,
    required: StructType, seed: Long) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val gp = partition.asInstanceOf[GraftInputPartition]
    new PartitionReader[InternalRow] {
      private val entries = Compiler.compileSchema(schemaJson)
      private val requiredIdx = required.fieldNames.map(full.fieldIndex)
      private val converters = requiredIdx.map(i =>
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToCatalystConverter(full.fields(i).dataType))
      private var id = gp.start
      private var pending: Iterator[org.apache.spark.sql.Row] = Iterator.empty
      private var current: InternalRow = _

      override def next(): Boolean = {
        while (!pending.hasNext && id < gp.end) {
          val ctx = new GenContext(Rng.forKey(seed, id), id)
          pending = Synth.emitRows(entries, ctx, id)
          id += 1
        }
        if (pending.hasNext) {
          val row = pending.next()
          val values = new Array[Any](requiredIdx.length)
          var k = 0
          while (k < requiredIdx.length) {
            values(k) = converters(k)(row.get(requiredIdx(k)))
            k += 1
          }
          current = InternalRow.fromSeq(values.toSeq)
          true
        } else false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

final class GraftReaderFactory(schemaJson: String, full: StructType,
    required: StructType, seed: Long) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val gp = partition.asInstanceOf[GraftInputPartition]
    new PartitionReader[InternalRow] {
      private val entries = Compiler.compileSchema(schemaJson) // fresh state per task
      private val ctx = new GenContext(Rng.forPartition(seed, gp.pid), 0L)
      private val requiredIdx = required.fieldNames.map(full.fieldIndex)
      private val converters = requiredIdx.map(i =>
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToCatalystConverter(full.fields(i).dataType))
      private var id = gp.start
      private var pending: Iterator[org.apache.spark.sql.Row] = Iterator.empty
      private var current: InternalRow = _

      override def next(): Boolean = {
        while (!pending.hasNext && id < gp.end) {
          pending = Synth.emitRows(entries, ctx, id)
          id += 1
        }
        if (pending.hasNext) {
          val row = pending.next()
          val values = new Array[Any](requiredIdx.length)
          var k = 0
          while (k < requiredIdx.length) {
            values(k) = converters(k)(row.get(requiredIdx(k)))
            k += 1
          }
          current = InternalRow.fromSeq(values.toSeq)
          true
        } else false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
