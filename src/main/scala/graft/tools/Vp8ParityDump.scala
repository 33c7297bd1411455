package graft.tools

/** Dev-side half of the VP8 parity harness: decode each
  * `caseN.webp` in a directory with [[graft.ops.Vp8]] and dump the
  * visible-region YUV planes as `caseN.scala.yuv` (same layout the
  * python side writes from libwebp's WebPDecodeYUV: LE u32 W, H, then
  * Y, U, V cropped rows). The python comparer asserts byte equality —
  * VP8 decoding is exact integer math, so any divergence is a bug on
  * one side. Results recorded in COVERAGE.md; the repeatable in-repo
  * checks are Vp8Spec's baked fixtures.
  */
object Vp8ParityDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/vp8_parity")
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.matches("case\\d+\\.webp")).sortBy(_.getName)
    var ok = 0
    files.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val payload = graft.ops.Vp8.vp8Chunk(bytes).getOrElse {
        System.err.println(s"${f.getName}: no VP8 chunk"); return
      }
      graft.ops.Vp8.decodeKeyframe(payload) match {
        case Some(fr) =>
          val w = fr.width; val h = fr.height
          val cw = (w + 1) / 2; val ch = (h + 1) / 2
          val out = new java.io.ByteArrayOutputStream()
          def le32(v: Int): Unit = {
            out.write(v & 0xff); out.write((v >> 8) & 0xff)
            out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
          }
          le32(w); le32(h)
          var r = 0
          while (r < h) { out.write(fr.y, r * fr.yStride, w); r += 1 }
          r = 0
          while (r < ch) { out.write(fr.u, r * fr.uvStride, cw); r += 1 }
          r = 0
          while (r < ch) { out.write(fr.v, r * fr.uvStride, cw); r += 1 }
          java.nio.file.Files.write(java.nio.file.Paths.get(dir,
            f.getName.replace(".webp", ".scala.yuv")), out.toByteArray)
          ok += 1
        case None =>
          System.err.println(s"${f.getName}: decode returned None")
      }
    }
    println(s"[vp8parity] dumped $ok/${files.length}")
  }

}
