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
  * uuid-named temps under `path/_tmp/<gen>/` (invisible to the reader's
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

/** All byte IO through [[ArchiveFs]] (Hadoop FileSystem), so the sink
  * writes `file:`/`hdfs://`/`s3a://` destinations alike. Concurrency
  * hardening (r11 advice): each write job owns a generation id minted
  * driver-side at plan time; task temps live under `_tmp/<gen>/` (so
  * a concurrent job's commit/abort can never delete this job's
  * in-flight temps), and the manifest read-modify-write runs under an
  * exclusive `_MANIFEST.lock` ([[ArchiveFs.withLock]]) so two
  * concurrent appends to the same path serialize instead of last-
  * writer-wins dropping entries.
  */
final class WarcBatchWrite(path: String, schema: StructType, gzipped: Boolean,
    truncate: Boolean) extends BatchWrite {
  private val gen = java.util.UUID.randomUUID.toString.take(8)
  private def tmpDir = ArchiveFs.child(ArchiveFs.child(path, "_tmp"), gen)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new WarcWriterFactory(tmpDir, schema.json, gzipped, ArchiveFs.carrier())

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    ArchiveFs.mkdirs(path)
    val committed = messages.collect { case WarcCommit(tmp, n) => (tmp, n) }
      .filter(_._2 > 0).sortBy(_._1)
    val ext = if (gzipped) ".warc.gz" else ".warc"
    val entries = committed.zipWithIndex.map { case ((tmp, n), i) =>
      val name = f"part-$gen-$i%05d$ext"
      ArchiveFs.rename(ArchiveFs.child(tmpDir, tmp), ArchiveFs.child(path, name))
      ArchiveFs.rename(ArchiveFs.child(tmpDir, tmp + ".cdx"),
        ArchiveFs.child(path, name + ".cdx"))
      (name, n)
    }
    val entryRe = """\{"segment":"([^"]+)","records":(\d+)\}""".r
    ArchiveFs.withLock(ArchiveFs.child(path, "_MANIFEST.lock")) {
      val prev: Seq[String] =
        if (!truncate)
          ArchiveFs.readManifest(path)
            .map(m => entryRe.findAllMatchIn(m).map(_.matched).toSeq)
            .getOrElse(Seq.empty)
        else Seq.empty
      val manifest =
        (prev ++ entries.map { case (n, r) => s"""{"segment":"$n","records":$r}""" })
          .mkString("[", ",", "]")
      // immutable numbered generation + legacy mirror: no visibility
      // window on object stores (see ArchiveFs.publishManifest)
      ArchiveFs.publishManifest(path, manifest)
    }
    if (truncate) {
      val keep = entries.map(_._1).toSet
      ArchiveFs.list(path).foreach { p =>
        val n = ArchiveFs.name(p)
        val base = n.stripSuffix(".cdx")
        if (n.startsWith("part-") && (base.endsWith(".warc") || base.endsWith(".warc.gz"))
            && !keep(base))
          ArchiveFs.delete(p)
      }
    }
    deleteTmp()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = deleteTmp()

  // only THIS job's generation dir — a concurrent writer's temps survive;
  // the shared _tmp parent goes only once it is empty
  private def deleteTmp(): Unit = {
    ArchiveFs.delete(tmpDir, recursive = true)
    ArchiveFs.deleteIfEmptyDir(ArchiveFs.child(path, "_tmp"))
  }
}

final class WarcWriterFactory(tmpDir: String, schemaJson: String, gzipped: Boolean,
    confSer: SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    confSer.install() // driver conf -> executor tasks
    new WarcWriter(tmpDir, schemaJson, gzipped)
  }
}

/** One temp segment + CDX sidecar per task attempt, under the write
  * job's own `_tmp/<gen>/` namespace.
  */
final class WarcWriter(tmpDirPath: String, schemaJson: String, gzipped: Boolean)
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
  // optional crawl-dedup headers: written when the column exists and
  // is non-null (round-trip fidelity for revisit corpora), absent
  // otherwise — the pre-revisit schema stays byte-identical
  private def optIdx(name: String): Int = st.fieldNames.indexOf(name)
  private val oDigest = optIdx("payload_digest")
  private val oRefers = optIdx("refers_to")
  private val oProfile = optIdx("warc_profile")
  private val oTrunc = optIdx("truncated")

  private val tmpName = java.util.UUID.randomUUID.toString +
    (if (gzipped) ".warc.gz" else ".warc")
  ArchiveFs.mkdirs(tmpDirPath)
  private val out = new WarcIo.CountingOutputStream(new java.io.BufferedOutputStream(
    ArchiveFs.create(ArchiveFs.child(tmpDirPath, tmpName)), 1 << 16))
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
        val code = row.getInt(oStatus)
        val sb = new StringBuilder(128)
        // standard reason phrase per code; unknown codes get an empty
        // reason ("HTTP/1.1 599 " — legal per RFC 7230 §3.1.2), never
        // a wrong one like "404 OK" (r11 advice)
        sb.append("HTTP/1.1 ").append(code).append(' ')
          .append(WarcWriter.reasonPhrase(code)).append("\r\n")
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
    var extra = List.empty[(String, String)]
    if (oTrunc >= 0 && !row.isNullAt(oTrunc))
      extra = ("WARC-Truncated" -> row.getUTF8String(oTrunc).toString) :: extra
    if (oProfile >= 0 && !row.isNullAt(oProfile))
      extra = ("WARC-Profile" -> row.getUTF8String(oProfile).toString) :: extra
    if (oRefers >= 0 && !row.isNullAt(oRefers))
      extra = ("WARC-Refers-To" ->
        s"<${row.getUTF8String(oRefers)}>") :: extra
    if (oDigest >= 0 && !row.isNullAt(oDigest))
      extra = ("WARC-Payload-Digest" ->
        row.getUTF8String(oDigest).toString) :: extra
    val off = out.count
    if (gzipped)
      WarcIo.writeRecordGzip(out, row.getUTF8String(oType).toString,
        row.getUTF8String(oId).toString, row.getUTF8String(oDate).toString,
        uri, ct, block, extra)
    else
      WarcIo.writeRecord(out, row.getUTF8String(oType).toString,
        row.getUTF8String(oId).toString, row.getUTF8String(oDate).toString,
        uri, ct, block, extra)
    cdx.append(off).append('\t').append(out.count - off).append('\t')
      .append(if (uri == null) "-" else uri).append('\n')
    records += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    ArchiveFs.writeBytes(ArchiveFs.child(tmpDirPath, tmpName + ".cdx"),
      cdx.toString.getBytes("UTF-8"))
    WarcCommit(tmpName, records)
  }

  override def abort(): Unit = {
    out.close()
    ArchiveFs.delete(ArchiveFs.child(tmpDirPath, tmpName))
    ArchiveFs.delete(ArchiveFs.child(tmpDirPath, tmpName + ".cdx"))
  }

  override def close(): Unit = ()
}

object WarcWriter {
  /** RFC 9110 reason phrases for the codes a crawl corpus actually
    * carries; anything else writes an empty reason.
    */
  def reasonPhrase(code: Int): String = code match {
    case 200 => "OK"
    case 201 => "Created"
    case 204 => "No Content"
    case 206 => "Partial Content"
    case 301 => "Moved Permanently"
    case 302 => "Found"
    case 303 => "See Other"
    case 304 => "Not Modified"
    case 307 => "Temporary Redirect"
    case 308 => "Permanent Redirect"
    case 400 => "Bad Request"
    case 401 => "Unauthorized"
    case 403 => "Forbidden"
    case 404 => "Not Found"
    case 410 => "Gone"
    case 429 => "Too Many Requests"
    case 500 => "Internal Server Error"
    case 502 => "Bad Gateway"
    case 503 => "Service Unavailable"
    case 504 => "Gateway Timeout"
    case _   => ""
  }
}
