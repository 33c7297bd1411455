package graft.sources

import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory,
  PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType

/** WRITE half of the `warc` DataSource V2 connector: curation output
  * back to the archive exchange format, each task emitting one
  * `.warc.gz` segment (record-per-gzip-member, the seekable
  * web-archive convention) PLUS its `.cdx` sidecar — so everything
  * this engine writes is immediately splittable to read back
  * ([[WarcDataSource.cdxOffsets]]) and point-addressable
  * ([[WarcRandomAccess]]).
  *
  * {{{ df.write.format("warc").option("path", dir).save() }}}
  *
  * Input columns (by name, any order): record_id, warc_type,
  * warc_date, content_type (required non-null), target_uri (nullable),
  * http_status / http_content_type (nullable), payload (binary). A
  * non-null http_status means `payload` is an HTTP BODY and the writer
  * synthesizes the response head — the exact inverse of the reader's
  * head/body split, so read(write(df)) round-trips field-for-field.
  * Extra columns (payload_len, anything else) are ignored: a DataFrame
  * straight off `spark.read.format("warc")` writes back unchanged.
  *
  * CDX sidecar lines are `offset<TAB>length<TAB>uri` — column 0 is
  * what the reader's splitter consumes (extra columns ignored), the
  * uri column is what CDX point lookup joins on. URIs containing tabs
  * or newlines would corrupt the sidecar; RFC 3986 URIs cannot.
  *
  * Commit protocol (same shape as [[ShardSink]]): task attempts write
  * uuid-named temps under `path/_tmp/` (invisible to the reader's
  * `listFiles`, which only scans the top level), the driver renames
  * winners to generation-unique `part-<gen>-NNNNN.warc.gz` (+ `.cdx`)
  * and then atomically swaps `_MANIFEST.json`. Readers going through
  * the manifest never see a partial commit; convention-bound readers
  * that just list `*.warc.gz` see only fully-written, renamed segments
  * (a crash mid-commit can expose a complete subset to those readers —
  * the same contract as Hadoop's v2 file committer, stated not hidden).
  */
final class WarcWriteBuilder(path: String, schema: StructType, gzipped: Boolean)
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new WarcBatchWrite(path, schema, gzipped, doTruncate)
  }
}

final case class WarcCommit(tmpName: String, records: Long) extends WriterCommitMessage

final class WarcBatchWrite(path: String, schema: StructType, gzipped: Boolean,
    truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new WarcWriterFactory(path, schema.json, gzipped)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(dir)
    val committed = messages.collect { case WarcCommit(tmp, n) => (tmp, n) }
      .filter(_._2 > 0).sortBy(_._1)
    val ext = if (gzipped) ".warc.gz" else ".warc"
    val gen = java.util.UUID.randomUUID.toString.take(8)
    val entries = committed.zipWithIndex.map { case ((tmp, n), i) =>
      val name = f"part-$gen-$i%05d$ext"
      java.nio.file.Files.move(dir.resolve("_tmp").resolve(tmp),
        dir.resolve(name), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      java.nio.file.Files.move(dir.resolve("_tmp").resolve(tmp + ".cdx"),
        dir.resolve(name + ".cdx"), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      (name, n)
    }
    val manifestPath = dir.resolve("_MANIFEST.json")
    val entryRe = """\{"segment":"([^"]+)","records":(\d+)\}""".r
    val prev: Seq[String] =
      if (!truncate && java.nio.file.Files.exists(manifestPath)) {
        val txt = new String(java.nio.file.Files.readAllBytes(manifestPath), "UTF-8")
        entryRe.findAllMatchIn(txt).map(_.matched).toSeq
      } else Seq.empty
    val manifest =
      (prev ++ entries.map { case (n, r) => s"""{"segment":"$n","records":$r}""" })
        .mkString("[", ",", "]")
    val mTmp = dir.resolve(s"._MANIFEST.$gen.tmp")
    java.nio.file.Files.write(mTmp, manifest.getBytes("UTF-8"))
    java.nio.file.Files.move(mTmp, manifestPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    if (truncate) {
      val keep = entries.map(_._1).toSet
      val ls = java.nio.file.Files.list(dir)
      try ls.iterator().asScala.foreach { p =>
        val n = p.getFileName.toString
        val base = n.stripSuffix(".cdx")
        if (n.startsWith("part-") && (base.endsWith(".warc") || base.endsWith(".warc.gz"))
            && !keep(base))
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

final class WarcWriterFactory(path: String, schemaJson: String, gzipped: Boolean)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WarcWriter(path, schemaJson, gzipped)
}

/** One temp segment + CDX sidecar per task attempt. */
final class WarcWriter(path: String, schemaJson: String, gzipped: Boolean)
    extends DataWriter[InternalRow] {
  private val st = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
    .asInstanceOf[StructType]
  // fieldIndex throws naming the missing column — the schema contract
  private val oId = st.fieldIndex("record_id")
  private val oType = st.fieldIndex("warc_type")
  private val oUri = st.fieldIndex("target_uri")
  private val oDate = st.fieldIndex("warc_date")
  private val oCt = st.fieldIndex("content_type")
  private val oStatus = st.fieldIndex("http_status")
  private val oHct = st.fieldIndex("http_content_type")
  private val oPayload = st.fieldIndex("payload")

  private val tmpName = java.util.UUID.randomUUID.toString +
    (if (gzipped) ".warc.gz" else ".warc")
  private val tmpDir = java.nio.file.Paths.get(path, "_tmp")
  java.nio.file.Files.createDirectories(tmpDir)
  private val out = new WarcIo.CountingOutputStream(new java.io.BufferedOutputStream(
    java.nio.file.Files.newOutputStream(tmpDir.resolve(tmpName)), 1 << 16))
  private val cdx = new java.lang.StringBuilder("#graft-cdx offset\tlength\turi\n")
  private var records = 0L

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(oId) && !row.isNullAt(oType) && !row.isNullAt(oDate) &&
      !row.isNullAt(oCt) && !row.isNullAt(oPayload),
      "warc sink: record_id/warc_type/warc_date/content_type/payload must be non-null")
    val ct = row.getUTF8String(oCt).toString
    val body = row.getBinary(oPayload)
    val block =
      if (!row.isNullAt(oStatus)) {
        require(ct.toLowerCase(java.util.Locale.ROOT).startsWith("application/http"),
          s"warc sink: http_status set but content_type is not application/http: $ct")
        val sb = new StringBuilder(128)
        sb.append("HTTP/1.1 ").append(row.getInt(oStatus)).append(" OK\r\n")
        if (!row.isNullAt(oHct))
          sb.append("Content-Type: ").append(row.getUTF8String(oHct)).append("\r\n")
        sb.append("Content-Length: ").append(body.length).append("\r\n\r\n")
        val head = sb.toString.getBytes(US_ASCII)
        val b = new Array[Byte](head.length + body.length)
        System.arraycopy(head, 0, b, 0, head.length)
        System.arraycopy(body, 0, b, head.length, body.length)
        b
      } else body
    val uri = if (row.isNullAt(oUri)) null else row.getUTF8String(oUri).toString
    val off = out.count
    if (gzipped)
      WarcIo.writeRecordGzip(out, row.getUTF8String(oType).toString,
        row.getUTF8String(oId).toString, row.getUTF8String(oDate).toString,
        uri, ct, block)
    else
      WarcIo.writeRecord(out, row.getUTF8String(oType).toString,
        row.getUTF8String(oId).toString, row.getUTF8String(oDate).toString,
        uri, ct, block)
    cdx.append(off).append('\t').append(out.count - off).append('\t')
      .append(if (uri == null) "-" else uri).append('\n')
    records += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    java.nio.file.Files.write(tmpDir.resolve(tmpName + ".cdx"),
      cdx.toString.getBytes("UTF-8"))
    WarcCommit(tmpName, records)
  }

  override def abort(): Unit = {
    out.close()
    java.nio.file.Files.deleteIfExists(tmpDir.resolve(tmpName))
    java.nio.file.Files.deleteIfExists(tmpDir.resolve(tmpName + ".cdx"))
  }

  override def close(): Unit = ()
}
