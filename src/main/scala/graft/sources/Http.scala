package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{DataFormatException, GZIPInputStream, Inflater}

/** HTTP/1.1 message-body decoding for archived responses — the wire
  * framings a crawl stores verbatim and a curation pipeline must
  * remove before any byte of content analysis: chunked
  * transfer-encoding (RFC 9112 §7.1: hex size line, optional `;ext`,
  * CRLF-framed chunks, a zero chunk then optional trailers) and
  * gzip/deflate content-encoding (RFC 9110 §8.4.1 — where "deflate"
  * means zlib-wrapped, but enough servers send raw DEFLATE that every
  * real client tries both; so do we).
  *
  * Both return None instead of throwing: archived HTTP is untrusted
  * input, and the caller ([[WarcIo.readRecord]]) quarantines with
  * `payloadDecoded = false` and the raw bytes kept — the
  * [[graft.expr.DecodeCharset]] convention one layer down the stack.
  */
object Http {

  /** Remove chunked framing. None when the framing is malformed
    * (non-hex size, missing CRLF, a chunk running past the buffer, no
    * terminating zero chunk — truncation is the common real cause).
    */
  def dechunk(b: Array[Byte]): Option[Array[Byte]] = {
    if (b == null) return None
    val out = new ByteArrayOutputStream(b.length)
    var p = 0
    def readSizeLine(): Long = {
      // hex digits, optional ;extension, then CRLF
      var v = 0L
      var digits = 0
      while (p < b.length && isHex(b(p)) && digits <= 8) {
        v = (v << 4) | hexVal(b(p)); p += 1; digits += 1
      }
      if (digits == 0 || digits > 8) return -1L
      while (p < b.length && b(p) != '\r' && b(p) != '\n') p += 1 // ;ext
      if (p + 1 >= b.length || b(p) != '\r' || b(p + 1) != '\n') return -1L
      p += 2
      v
    }
    var sz = readSizeLine()
    while (sz > 0) {
      if (p + sz + 2 > b.length) return None // chunk (+CRLF) truncated
      out.write(b, p, sz.toInt)
      p += sz.toInt
      if (b(p) != '\r' || b(p + 1) != '\n') return None
      p += 2
      sz = readSizeLine()
    }
    if (sz < 0) return None
    // zero chunk seen; trailers (if any) run to a blank line — their
    // absence or truncation does not invalidate the already-complete
    // body
    Some(out.toByteArray)
  }

  private def isHex(c: Byte): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  private def hexVal(c: Byte): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10

  /** Apply a Content-Encoding token: gzip/x-gzip via the member
    * stream, deflate as zlib first then raw (the broken-server form).
    * None for an unknown token or corrupt data.
    */
  def decompress(b: Array[Byte], encoding: String): Option[Array[Byte]] =
    encoding match {
      case "gzip" | "x-gzip" =>
        try {
          val in = new GZIPInputStream(
            new java.io.ByteArrayInputStream(b), 1 << 16)
          val out = new ByteArrayOutputStream(b.length * 4)
          val buf = new Array[Byte](1 << 16)
          var k = in.read(buf)
          while (k >= 0) { out.write(buf, 0, k); k = in.read(buf) }
          Some(out.toByteArray)
        } catch { case _: java.io.IOException => None }
      case "deflate" =>
        inflate(b, raw = false).orElse(inflate(b, raw = true))
      case _ => None // br/zstd/compress: no codec in this environment
    }

  private def inflate(b: Array[Byte], raw: Boolean): Option[Array[Byte]] = {
    val inf = new Inflater(raw)
    try {
      inf.setInput(b)
      val out = new ByteArrayOutputStream(b.length * 4)
      val buf = new Array[Byte](1 << 16)
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k == 0 && (inf.needsInput() || inf.needsDictionary()))
          return None // truncated or preset-dictionary stream
        out.write(buf, 0, k)
      }
      Some(out.toByteArray)
    } catch {
      case _: DataFormatException => None
    } finally inf.end()
  }
}
