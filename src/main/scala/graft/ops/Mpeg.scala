package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** MPEG audio (MP3) frame-header metadata — the audio sibling of
  * [[Mp4]]: what a curation pipeline needs from an `.mp3` column
  * before (or instead of) any decode is stream shape — sample rate,
  * bitrate, channel mode, frame count, duration — all of which live
  * in the public ISO 11172-3 frame header grammar: an 11-bit sync,
  * version/layer bits, table-indexed bitrate/samplerate, and a
  * computable frame length that lets a parser WALK the stream without
  * decoding a single sample. ID3v2 prefixes (the de-facto tagging
  * container) are skipped by their syncsafe declared size.
  *
  * Scope: MPEG-1 Layer III (the overwhelming web share). Frames of
  * other versions/layers stop the walk (counted as end-of-stream, not
  * an error); a stream with no valid sync parses to None — the honest
  * null of [[Mp4.parseMeta]]/[[Multimodal.decodeWav]]. Validation is
  * the same boundary as Mp4, stated plainly: no third-party MP3 tool
  * exists in this container, so parity is in-repo builder + spec-
  * pinned hand-computed offsets + the q164 analytic oracle.
  */
object Mpeg {

  /** MPEG-1 Layer III bitrates (kbps) by header index 1..14. */
  private[graft] val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  /** MPEG-1 sample rates by header index 0..2. */
  private[graft] val SampleRate: Array[Int] = Array(44100, 48000, 32000)

  final case class Meta(nFrames: Int, sampleRate: Int, bitrateKbps: Int,
      channels: Int, durationMs: Long, id3Bytes: Int)

  // ------------------------------------------------------------- builder

  /** `frames` MPEG-1 Layer III frames (zero payload, no padding bit),
    * optionally prefixed by an ID3v2 container of `id3Size` payload
    * bytes and/or `junk` leading garbage (the resync case).
    */
  def build(frames: Int, samplerateIdx: Int, bitrateIdx: Int,
      stereo: Boolean = true, id3Size: Int = -1, junk: Int = 0): Array[Byte] = {
    require(samplerateIdx >= 0 && samplerateIdx <= 2, s"sr idx $samplerateIdx")
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"br idx $bitrateIdx")
    val out = new ByteArrayOutputStream()
    if (id3Size >= 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0) // version 2.4.0
      out.write(0) // flags
      // syncsafe size: 4x 7-bit groups, big-endian
      out.write((id3Size >> 21) & 0x7f); out.write((id3Size >> 14) & 0x7f)
      out.write((id3Size >> 7) & 0x7f); out.write(id3Size & 0x7f)
      (0 until id3Size).foreach(i => out.write(i % 100)) // tag payload
    }
    // garbage BETWEEN tag and audio — the realistic resync case
    (0 until junk).foreach(i => out.write(0x20 + (i % 64))) // never 0xFF
    val frameLen =
      144000 * BitrateKbps(bitrateIdx) / SampleRate(samplerateIdx)
    (0 until frames).foreach { _ =>
      out.write(0xff)
      out.write(0xfb) // sync(3) + MPEG1(11) + Layer III(01) + no-CRC(1)
      out.write((bitrateIdx << 4) | (samplerateIdx << 2)) // padding 0, priv 0
      out.write(if (stereo) 0x00 else 0xc0) // channel mode in the top 2 bits
      (0 until frameLen - 4).foreach(_ => out.write(0))
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- parser

  def parseMeta(bytes: Array[Byte]): Option[Meta] = {
    if (bytes == null || bytes.length < 4) return None
    var o = 0
    var id3 = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      id3 = 10 + size
      o = math.min(id3, bytes.length)
    }
    // scan for the first MPEG-1 Layer III sync
    def headerAt(p: Int): Boolean =
      p + 4 <= bytes.length && (bytes(p) & 0xff) == 0xff &&
        (bytes(p + 1) & 0xfe) == 0xfa // 1111101x: MPEG1 + Layer III
    while (o < bytes.length && !headerAt(o)) o += 1
    if (!headerAt(o)) return None
    val brIdx = (bytes(o + 2) >> 4) & 0x0f
    val srIdx = (bytes(o + 2) >> 2) & 0x03
    if (brIdx < 1 || brIdx > 14 || srIdx > 2) return None
    val sr = SampleRate(srIdx)
    val br = BitrateKbps(brIdx)
    val channels = if (((bytes(o + 3) >> 6) & 0x03) == 3) 1 else 2
    var n = 0
    var p = o
    var ok = true
    while (ok && headerAt(p)) {
      val b = (bytes(p + 2) >> 4) & 0x0f
      val s = (bytes(p + 2) >> 2) & 0x03
      val pad = (bytes(p + 2) >> 1) & 0x01
      if (b < 1 || b > 14 || s > 2) ok = false
      else {
        val len = 144000 * BitrateKbps(b) / SampleRate(s) + pad
        if (p + len > bytes.length) ok = false // truncated final frame drops
        else { n += 1; p += len }
      }
    }
    if (n == 0) return None
    Some(Meta(n, sr, br, channels, n.toLong * 1152 * 1000 / sr, id3))
  }

  // ----------------------------------------------------------- DataFrame

  private val metaType = StructType(Seq(
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bitrate_kbps", IntegerType),
    StructField("channels", IntegerType),
    StructField("duration_ms", LongType),
    StructField("id3_bytes", IntegerType)))

  /** Appends `${binCol}_mp3` (struct, null when unparseable) — the
    * [[Multimodal.decodeFeatures]] mapPartitions seam.
    */
  def audioMeta(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(s"${binCol}_mp3", metaType))
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val m = parseMeta(r.getAs[Array[Byte]](binIdx)) match {
          case Some(x) => Row(x.nFrames, x.sampleRate, x.bitrateKbps,
            x.channels, x.durationMs, x.id3Bytes)
          case None => null
        }
        Row.fromSeq(r.toSeq :+ m)
      }
    }
  }
}
