package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability,
  TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory,
  LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path: an exactly-once sharded JSONL sink — the
  * exchange format LLM training corpora actually ship in. Completes
  * the repo's connector ladder (the `graft` V2 READ source, the
  * `synth()` table function, injected expressions/rules/strategies)
  * with the write half of the V2 API.
  *
  * Commit protocol (the part that makes it exactly-once):
  *   - each task writes its rows to `path/_tmp/<uuid>.jsonl` and
  *     reports the temp name + row count in its commit message;
  *     speculative/retried attempts write DIFFERENT uuids and only the
  *     committed attempt's message reaches the driver;
  *   - the driver's BatchWrite.commit renames committed temp files to
  *     generation-unique `shard-<gen>-NNNNN.jsonl` names, then swaps in
  *     `_MANIFEST.json` (temp file + ATOMIC_MOVE) listing every shard
  *     with its row count — readers that go through the manifest never
  *     observe a partial write, and a crash mid-commit leaves the
  *     previous generation complete and readable;
  *   - abort() deletes the temp directory, leaving the destination
  *     untouched.
  *
  * Rows are serialized with Spark's own JacksonGenerator, so output
  * matches `to_json` semantics exactly. Usage:
  * {{{ df.write.format("graft-shards").option("path", dir).save() }}}
  */
final class ShardSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-shards"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil) // write-only: schema comes from the written DataFrame
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ShardTable(schema, new CaseInsensitiveStringMap(properties))
}

final class ShardTable(schema: StructType, opts: CaseInsensitiveStringMap)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-shards(${opts.get("path")})"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val path = Option(opts.get("path")).orElse(Option(info.options.get("path")))
      .getOrElse(throw new IllegalArgumentException(
        "graft-shards sink requires a 'path' option"))
    new ShardWriteBuilder(path, info.schema())
  }
}

/** TRUNCATE (mode("overwrite")) replaces the previous shard set: new
  * shards are published under generation-unique names first, the
  * manifest swap (ATOMIC_MOVE) is the atomic point, and only then are
  * the no-longer-referenced old shard files deleted — a crash at any
  * step leaves exactly one complete generation on disk.
  *
  * Filesystem assumption (by design, documented not hidden): commit()
  * renames task temp files with driver-local java.nio, so the
  * exactly-once protocol requires the driver and executors to share
  * `path` (local mode, NFS, or any POSIX-shared volume). A cluster
  * deployment over object storage would swap the rename for a
  * FileSystem-API copy-and-delete commit; the protocol shape
  * (uuid temps -> driver-published manifest) is unchanged.
  */
final class ShardWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ShardBatchWrite(path, schema, doTruncate)
  }
}

final case class ShardCommit(tmpName: String, rows: Long) extends WriterCommitMessage

final class ShardBatchWrite(path: String, schema: StructType,
    truncate: Boolean = false) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ShardWriterFactory(path, schema.json)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(dir)
    val committed = messages.collect { case ShardCommit(tmp, rows) => (tmp, rows) }
      .filter(_._2 > 0).sortBy(_._1)
    // generation-unique names: the previous shard set AND the manifest
    // pointing at it stay fully intact and readable until the manifest
    // swap below. A crash anywhere before the swap leaves the OLD
    // dataset complete; a crash after it leaves the NEW one — never a
    // mixed, partial, or empty state.
    val gen = java.util.UUID.randomUUID.toString.take(8)
    val entries = committed.zipWithIndex.map { case ((tmp, rows), i) =>
      val name = f"shard-$gen-$i%05d.jsonl"
      java.nio.file.Files.move(dir.resolve("_tmp").resolve(tmp),
        dir.resolve(name), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      (name, rows)
    }
    // empty-task temp files (0 rows) just get cleaned with the tmp dir
    val manifestPath = dir.resolve("_MANIFEST.json")
    // append mode keeps the previous generation's entries; truncate
    // (mode("overwrite")) replaces them
    val entryRe = """\{"shard":"([^"]+)","rows":(\d+)\}""".r
    val prev: Seq[String] =
      if (!truncate && java.nio.file.Files.exists(manifestPath)) {
        val txt = new String(java.nio.file.Files.readAllBytes(manifestPath), "UTF-8")
        entryRe.findAllMatchIn(txt).map(_.matched).toSeq
      } else Seq.empty
    val manifest =
      (prev ++ entries.map { case (n, r) => s"""{"shard":"$n","rows":$r}""" })
        .mkString("[", ",", "]")
    // the atomic publish point: temp manifest + ATOMIC_MOVE
    val mTmp = dir.resolve(s"._MANIFEST.$gen.tmp")
    java.nio.file.Files.write(mTmp, manifest.getBytes("UTF-8"))
    java.nio.file.Files.move(mTmp, manifestPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // only AFTER the swap: drop shard files the new manifest no longer
    // references (previous generations under truncate)
    if (truncate) {
      val keep = entries.map(_._1).toSet
      val ls = java.nio.file.Files.list(dir)
      try ls.iterator().asScala.foreach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("shard-") && n.endsWith(".jsonl") && !keep(n))
          java.nio.file.Files.deleteIfExists(p)
      } finally ls.close()
    }
    deleteTmp()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = deleteTmp()

  private def deleteTmp(): Unit = {
    val tmp = java.nio.file.Paths.get(path, "_tmp")
    if (java.nio.file.Files.exists(tmp)) {
      val ls = java.nio.file.Files.list(tmp)
      try ls.forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally ls.close()
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }
}

final class ShardWriterFactory(path: String, schemaJson: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ShardWriter(path, schemaJson)
}

/** One temp JSONL file per task attempt; the uuid name makes retried /
  * speculative attempts collision-free, and only the winning attempt's
  * commit message is published by the driver.
  */
final class ShardWriter(path: String, schemaJson: String)
    extends DataWriter[InternalRow] {
  private val st = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
    .asInstanceOf[StructType]
  private val tmpName = java.util.UUID.randomUUID.toString + ".jsonl"
  private val tmpDir = java.nio.file.Paths.get(path, "_tmp")
  java.nio.file.Files.createDirectories(tmpDir)
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    java.nio.file.Files.newOutputStream(tmpDir.resolve(tmpName)), "UTF-8"))
  private val gen = new org.apache.spark.sql.catalyst.json.JacksonGenerator(
    st, out, new org.apache.spark.sql.catalyst.json.JSONOptions(
      Map.empty[String, String], "UTC"))
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    gen.write(record)
    gen.writeLineEnding()
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    gen.close()
    ShardCommit(tmpName, rows)
  }

  override def abort(): Unit = {
    gen.close()
    java.nio.file.Files.deleteIfExists(tmpDir.resolve(tmpName))
  }

  override def close(): Unit = ()
}
