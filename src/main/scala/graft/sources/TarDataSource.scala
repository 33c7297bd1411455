package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability,
  TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField,
  StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for WebDataset tar shards:
  *
  * {{{
  * spark.read.format("wds").load("/corpus/shards")  // dir or one .tar
  * }}}
  *
  * Schema: (shard, name, key, ext, size, payload) — one row per
  * regular-file member, with the WebDataset sample split (key =
  * basename before the first dot, ext = the rest) precomputed so the
  * canonical `groupBy(shard, key)` sample assembly is a plain
  * aggregation. This replaces the whole-shard-as-one-binary-row seam
  * (r11 What's wrong #3): members stream out of a bounded
  * [[TarIo]] walk one at a time, so task memory is one member — a
  * 1 GB shard costs a 1 GB READ, not a 1 GB row plus copies, and the
  * 2 GB row ceiling is out of the picture.
  *
  * Scale shape: shards written by the `wds` SINK carry a sample-
  * offset index sidecar (`<shard>.idx` — the CDX move applied to
  * tar), so a shard splits into ranged partitions cut at SAMPLE
  * boundaries (~`splitTargetBytes` each): intra-shard parallelism,
  * and `groupBy(shard, key)` sample assembly stays intra-partition.
  * Foreign shards without a sidecar read as one partition per FILE
  * (tar alone has no index; the WebDataset convention ships many
  * ~100 MB-1 GB shards precisely so file granularity works as the
  * parallelism unit — same contract as gzip WARC without CDX).
  * `.tar.gz` shards stream through a gzip wrapper and never split.
  *
  * Pushdown: required-column pruning skips payload materialization
  * (members are SKIPPED by size, never allocated); `ext = '...'` /
  * `ext IN (...)` filters are consumed at the framer against the
  * EFFECTIVE member name (pax/GNU long names included), so a
  * text-only pass over an image-heavy corpus never allocates the
  * image bytes.
  *
  * Streaming: MICRO_BATCH via [[FileListMicroBatchStream]] — shards
  * land in a directory (or the sink's manifest) and are ingested
  * incrementally, at most `filesPerBatch` per trigger.
  */
final class TarDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "wds"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TarDataSource.Schema
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null,
      "wds source requires a path: spark.read.format(\"wds\").load(dir)")
    new TarTable(path, schema)
  }
}

object TarDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("shard", StringType),
    StructField("name", StringType),
    StructField("key", StringType),
    StructField("ext", StringType),
    StructField("size", LongType),
    StructField("payload", BinaryType)))

  /** WebDataset sample split of a member name — same convention as
    * [[graft.ops.Tar.sampleKey]]/`sampleExt` (basename, first dot).
    */
  def splitKeyExt(name: String): (String, String) = {
    val base = name.substring(name.lastIndexOf('/') + 1)
    val dot = base.indexOf('.')
    if (dot == 0) ("", base.substring(1))
    else if (dot < 0) (base, "")
    else (base.substring(0, dot), base.substring(dot + 1))
  }

  def isShard(n: String): Boolean = n.endsWith(".tar") || n.endsWith(".tar.gz")

  /** Shard files under `path` (or `path` itself), name-sorted. */
  def listFiles(path: String): Seq[String] = {
    val out =
      if (ArchiveFs.isDirectory(path))
        ArchiveFs.list(path).filter(f => isShard(ArchiveFs.name(f))).toVector
      else Vector(path)
    require(out.nonEmpty, s"no .tar / .tar.gz shards under $path")
    out.sorted
  }

  /** Shards named by `_MANIFEST.json` ([[WdsBatchWrite]]'s atomic
    * publish point), in manifest = append order.
    */
  def manifestFiles(path: String): Seq[String] = {
    val m = ArchiveFs.readManifest(path)
    require(m.nonEmpty,
      s"manifest read requested but no manifest under $path")
    """"shard":"([^"]+)"""".r.findAllMatchIn(m.get)
      .map(mm => ArchiveFs.child(path, mm.group(1))).toVector
  }

  /** Default ranged-split target — same rationale as the WARC CDX cut. */
  val TargetSplitBytes: Long = 64L * 1024 * 1024

  /** Ascending SAMPLE start offsets from `<shard>.idx` (the sink's
    * sidecar: `offset<TAB>key` per sample, comments ignored). None
    * when no sidecar exists — foreign shards read whole-file.
    */
  def idxOffsets(file: String): Option[Array[Long]] = {
    val idx = file + ".idx"
    if (!ArchiveFs.exists(idx)) return None
    Some(ArchiveFs.readString(idx).linesIterator
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.split("\t")(0).toLong).toArray.sorted)
  }

  /** Scan partitions for one shard: ranged splits cut at SAMPLE
    * boundaries when the index sidecar exists (so `groupBy(shard,
    * key)` sample assembly stays intra-partition), else the whole
    * file. Gzipped shards are never split (the stream is not
    * seekable).
    */
  def partitionsFor(f: String, targetBytes: Long): Seq[InputPartition] =
    if (!f.endsWith(".gz")) idxOffsets(f) match {
      case Some(offs) if offs.nonEmpty =>
        ArrayOfCuts.build(offs, ArchiveFs.length(f), targetBytes)
          .map { case (s, e) => TarInputPartition(f, s, e): InputPartition }
      case _ => Seq(TarInputPartition(f, 0L, Long.MaxValue))
    } else Seq(TarInputPartition(f, 0L, Long.MaxValue))
}

final class TarTable(path: String, tableSchema: StructType = TarDataSource.Schema)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"wds($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val fpb = Option(options.get("filesPerBatch")).map(_.toInt).getOrElse(1)
    val manifest = Option(options.get("manifestOnly")).exists(_.toBoolean)
    val target = Option(options.get("splitTargetBytes")).map(_.toLong)
      .getOrElse(TarDataSource.TargetSplitBytes)
    // explicit shard subset (names relative to path): the selective-
    // compaction read path — scan ONLY the fragmented shards, never
    // the whole corpus
    val shards = Option(options.get("shards"))
      .map(_.split(",").toSeq.filter(_.nonEmpty))
    new TarScanBuilder(path, fpb, manifest, target, shards)
  }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val target = Option(info.options.get("targetShardBytes")).map(_.toLong)
      .getOrElse(WdsBatchWrite.DefaultTargetShardBytes)
    // selective compaction: an append whose commit atomically swaps the
    // named shards out of the manifest (and off disk) as the new
    // generation's entries swap in — see WdsBatchWrite
    val replace = Option(info.options.get("replaceShards"))
      .map(_.split(",").toSet.filter(_.nonEmpty)).getOrElse(Set.empty[String])
    new WdsWriteBuilder(path, info.schema(), target, info.queryId(), replace)
  }
}

final class TarScanBuilder(path: String, filesPerBatch: Int, manifestOnly: Boolean,
    targetBytes: Long = TarDataSource.TargetSplitBytes,
    shards: Option[Seq[String]] = None) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = TarDataSource.Schema
  private var extFilter: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // pushed filters arrive as a CONJUNCTION, so a second ext predicate
  // narrows the accepted set by INTERSECTION (ext = 'a' AND ext IN
  // ('a','b') keeps {'a'}); a union here would widen the scan to rows
  // Spark never re-checks, i.e. wrong results, not a missed pushdown
  private def narrow(vs: Set[String]): Unit =
    extFilter = Some(extFilter.fold(vs)(_.intersect(vs)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("ext", v: String) => narrow(Set(v)); true
      case In("ext", vs) if vs.forall(_.isInstanceOf[String]) =>
        narrow(vs.map(_.asInstanceOf[String]).toSet); true
      case _ => false
    }
    pushed = accepted
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new TarScan(path, required, extFilter, filesPerBatch, manifestOnly,
      targetBytes, shards)
}

/** One scan task: the byte range [start, end) of `file` — the whole
  * file (end = Long.MaxValue) or a run of whole SAMPLES cut at index
  * offsets.
  */
final case class TarInputPartition(file: String, start: Long, end: Long)
    extends InputPartition

final class TarScan(path: String, required: StructType,
    extFilter: Option[Set[String]], filesPerBatch: Int, manifestOnly: Boolean,
    targetBytes: Long = TarDataSource.TargetSplitBytes,
    shards: Option[Seq[String]] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TarScan($path, cols=${required.fieldNames.mkString(",")}" +
      extFilter.map(e => s", ext in {${e.mkString(",")}}").getOrElse("") + ")"

  override def planInputPartitions(): Array[InputPartition] =
    (shards match {
      case Some(names) => names.map(n => ArchiveFs.child(path, n))
      case None =>
        if (manifestOnly) TarDataSource.manifestFiles(path)
        else TarDataSource.listFiles(path)
    }).flatMap(f => TarDataSource.partitionsFor(f, targetBytes)).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new TarReaderFactory(required, extFilter, ArchiveFs.carrier())

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new TarMicroBatchStream(path, required, extFilter, filesPerBatch,
      manifestOnly, targetBytes, checkpointLocation)
}

final class TarMicroBatchStream(path: String, required: StructType,
    extFilter: Option[Set[String]], filesPerBatch: Int, manifestOnly: Boolean,
    targetBytes: Long = TarDataSource.TargetSplitBytes,
    checkpointLocation: String = null)
    extends FileListMicroBatchStream(filesPerBatch, checkpointLocation) {
  // Directory mode prefers manifest order when _MANIFEST.json exists:
  // the stream's offsets pin a committed PREFIX, so the listing must
  // only ever grow at the tail — true of the manifest (append order by
  // construction) but NOT of a name-sorted listing of the sink's own
  // shards (part-<random gen>-NNNNN.tar: a second append generation
  // sorts before the first about half the time and the stream fails
  // its prefix validation). Plain name-sorted directory mode remains
  // for foreign corpora, which must add files in ascending name order.
  //
  // The choice is PINNED per stream, persisted under the checkpoint at
  // the first nonempty observation: a foreign dir that gains a manifest
  // MID-STREAM (someone runs the sink into it), or whose listing order
  // differs from manifest append order, must not flip modes — the
  // committed prefix would fail validation and the stream could never
  // resume without a new checkpoint. An EMPTY dir defers the decision
  // (nothing committed yet, so switching is still free).
  private val orderPin: Option[String] =
    Option(checkpointLocation).map(m => ArchiveFs.child(m, "graft-wds-order"))
  @volatile private var orderMode: Option[Boolean] = None // true = manifest
  private def useManifest(): Option[Boolean] = orderMode.orElse {
    val fromDisk = orderPin
      .filter(ArchiveFs.exists)
      .map(p => ArchiveFs.readString(p).trim == "manifest")
    val decided = fromDisk.orElse {
      if (ArchiveFs.hasManifest(path)) Some(true)
      else {
        val any =
          try TarDataSource.listFiles(path).nonEmpty
          catch { case _: IllegalArgumentException => false }
        if (any) Some(false) else None // nothing yet: defer the pin
      }
    }
    if (fromDisk.isEmpty) decided.foreach { m =>
      orderPin.foreach { p =>
        ArchiveFs.mkdirs(checkpointLocation)
        val tmp = p + ".tmp-" + java.util.UUID.randomUUID.toString.take(8)
        ArchiveFs.writeBytes(tmp,
          (if (m) "manifest" else "listing").getBytes("UTF-8"), overwrite = true)
        ArchiveFs.renameOverwrite(tmp, p)
      }
    }
    orderMode = decided
    decided
  }

  override protected def current(): Vector[String] =
    if (manifestOnly)
      try TarDataSource.manifestFiles(path).toVector
      catch { case _: IllegalArgumentException => Vector.empty }
    else useManifest() match {
      case Some(true) =>
        try TarDataSource.manifestFiles(path).toVector
        catch { case _: IllegalArgumentException => Vector.empty }
      case Some(false) =>
        try TarDataSource.listFiles(path).toVector
        catch { case _: IllegalArgumentException => Vector.empty }
      case None => Vector.empty
    }

  override protected def partitionsFor(f: String): Seq[InputPartition] =
    TarDataSource.partitionsFor(f, targetBytes)

  override def createReaderFactory(): PartitionReaderFactory =
    new TarReaderFactory(required, extFilter, ArchiveFs.carrier())
}

final class TarReaderFactory(required: StructType, extFilter: Option[Set[String]],
    confSer: SerializableHadoopConf) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    // ship the driver session's Hadoop conf (s3a credentials etc.) to
    // executors that have no SparkSession of their own
    confSer.install()
    val p = partition.asInstanceOf[TarInputPartition]
    val file = p.file
    new PartitionReader[InternalRow] {
      // ranged split: positioned open at a sample boundary; the range
      // ends at the next split's first header, where the framer's
      // clean-EOF rule stops the walk
      private val raw = ArchiveFs.open(file, p.start)
      private val bounded: java.io.InputStream =
        if (p.end == Long.MaxValue) raw
        else new WarcDataSource.BoundedInputStream(raw, p.end - p.start)
      private val in: java.io.InputStream =
        if (file.endsWith(".gz"))
          new java.util.zip.GZIPInputStream(bounded, 1 << 16)
        else new java.io.BufferedInputStream(bounded, 1 << 16)
      private val wantPayload = required.fieldNames.contains("payload")
      private val keep: String => Boolean = extFilter match {
        case Some(exts) => n => exts.contains(TarDataSource.splitKeyExt(n)._2)
        case None       => _ => true
      }
      private val it = TarIo.members(in, wantPayload, keep)
      private val fields = required.fieldNames
      private var current: InternalRow = _

      override def next(): Boolean =
        if (it.hasNext) {
          val m = it.next()
          val (key, ext) = TarDataSource.splitKeyExt(m.name)
          val values = new Array[Any](fields.length)
          var k = 0
          while (k < fields.length) {
            values(k) = fields(k) match {
              case "shard"   => UTF8String.fromString(file)
              case "name"    => UTF8String.fromString(m.name)
              case "key"     => UTF8String.fromString(key)
              case "ext"     => UTF8String.fromString(ext)
              case "size"    => m.size
              case "payload" => m.payload
            }
            k += 1
          }
          current = InternalRow.fromSeq(values.toSeq)
          true
        } else false

      override def get(): InternalRow = current
      override def close(): Unit = in.close()
    }
  }
}
