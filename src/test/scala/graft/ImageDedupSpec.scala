package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, ImageDedup}

class ImageDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def lumas(seed: Long): Array[Int] =
    Array.tabulate(ImageDedup.GridW * ImageDedup.GridH) { i =>
      Math.floorMod(graft.runtime.Rng.mix(seed * 1000 + i), 200L).toInt
    }

  private def decode(png: Array[Byte]) =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))

  test("grayPng round-trips lumas exactly through ImageIO") {
    val ls = lumas(1)
    val img = decode(ImageDedup.grayPng(ls, 9, 8))
    for (y <- 0 until 8; x <- 0 until 9) {
      val rgb = img.getRGB(x, y)
      assert((rgb & 0xff) == ls(y * 9 + x))
      assert(((rgb >> 8) & 0xff) == ls(y * 9 + x))
    }
  }

  test("dHash is invariant under uniform brightness shift, changes under content edit") {
    val base = lumas(2)
    val h0 = ImageDedup.dHashBits(decode(ImageDedup.grayPng(base, 9, 8)))
    val brighter = base.map(_ + 40) // max 239, never clamps
    assert(ImageDedup.dHashBits(decode(ImageDedup.grayPng(brighter, 9, 8))) == h0)
    // flipping one neighbor ORDER flips at least one bit
    val edited = base.clone()
    val i = base.indices.find(i => i % 9 < 8 && base(i + 1) != base(i)).get
    val tmp = edited(i); edited(i) = edited(i + 1); edited(i + 1) = tmp
    assert(ImageDedup.dHashBits(decode(ImageDedup.grayPng(edited, 9, 8))) != h0)
  }

  test("dHash survives the resize path: 4x nearest-neighbor upscale hashes identically") {
    val base = lumas(3)
    val h0 = ImageDedup.dHashBits(decode(ImageDedup.grayPng(base, 9, 8)))
    // 36x32 image of uniform 4x4 blocks: bilinear shrink back to 9x8
    // averages each block to its own value
    val big = Array.tabulate(36 * 32) { i =>
      val (x, y) = (i % 36, i / 36)
      base((y / 4) * 9 + x / 4)
    }
    val hBig = ImageDedup.dHashBits(decode(ImageDedup.grayPng(big, 36, 32)))
    assert(hBig == h0, f"resize path diverged: $h0%016x vs $hBig%016x")
  }

  test("dHash column: real decode on PNGs, null on undecodable payloads") {
    val rows = Seq(
      (1L, ImageDedup.grayPng(lumas(4), 9, 8)),
      (2L, "not an image".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "png")
    val out = ImageDedup.dHash(rows, "png").select("id", "png_dhash")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(1L).contains(ImageDedup.dHashBits(decode(ImageDedup.grayPng(lumas(4), 9, 8)))))
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("dHashPairs finds planted near-dups within hamming 3 via banding, no false pairs") {
    val base = (0L until 40L).map(i => i -> lumas(100 + i))
    // plant: id+1000 = brightness-shifted copy (hamming 0) for ids 0-9;
    // id+2000 = one-comparison edit (hamming >= 1, <= 3) for ids 10-14
    val shifted = (0L until 10L).map(i => (i + 1000L) -> lumas(100 + i).map(_ + 5))
    val edited = (10L until 15L).map { i =>
      val ls = lumas(100 + i).clone()
      val j = ls.indices.find(j => j % 9 < 8 && ls(j + 1) != ls(j)).get
      val t = ls(j); ls(j) = ls(j + 1); ls(j + 1) = t
      (i + 2000L) -> ls
    }
    val df = (base ++ shifted ++ edited)
      .map { case (id, ls) => (id, ImageDedup.grayPng(ls, 9, 8)) }
      .toDF("id", "png")
    val pairs = ImageDedup.dHashPairs(df, "id", "png", maxHamming = 3)
      .select("a", "b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    (0L until 10L).foreach { i =>
      assert(pairs.get((i, i + 1000L)).contains(0L), s"missing shifted pair $i")
    }
    (10L until 15L).foreach { i =>
      val h = pairs.get((i, i + 2000L))
      assert(h.exists(v => v >= 1L && v <= 3L), s"missing edited pair $i: $h")
    }
    // the 40 base images are mutually far apart — only planted pairs
    assert(pairs.size == 15, s"unexpected extra pairs: ${pairs.keys}")
  }

  test("bandedHammingPairs at maxHamming=0 equals the exact-equality grouping") {
    val sigs = Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 9L), (5L, -1L), (6L, -1L))
      .toDF("id", "sig")
    val got = Dedup.bandedHammingPairs(sigs, "id", "sig", 0)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L)))
  }

  test("imageFormat classifies every fixture kind by magic bytes; decodeCoverage counts decodability") {
    val rows = (0L until 80L).map(i => (i, ImageDedup.fixturePayload(i, (i % 8).toInt)))
    val df = rows.toDF("id", "img")
    val fmts = df.select(col("id"), ImageDedup.imageFormat(col("img")).as("f"))
      .collect().map(r => (r.getLong(0) % 8, r.getString(1))).distinct.sortBy(_._1)
    assert(fmts.toSeq == Seq(0L -> "png", 1L -> "jpeg", 2L -> "gif",
      3L -> "bmp", 4L -> "webp", 5L -> "other", 6L -> "missing",
      7L -> "webp"))
    // r11: the webp row decodes in BOTH profiles — kind 4 is a real
    // lossy VP8 keyframe through ops/Vp8, kind 7 VP8L lossless
    val cov = ImageDedup.decodeCoverage(df, "img")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cov == Map("png" -> (10L, 10L), "jpeg" -> (10L, 10L),
      "gif" -> (10L, 10L), "bmp" -> (10L, 10L), "webp" -> (20L, 20L),
      "other" -> (10L, 0L), "missing" -> (10L, 0L)))
  }

  test("lossy-VP8 dHash equals the analytic DC-recurrence hash (one MB per grid cell)") {
    // the kind-4 fixture is 144x128 = 9x8 flat macroblocks, one per
    // dHash grid cell, so the bilinear shrink samples inside flat
    // regions and the 64-bit hash is computable from the per-MB DC
    // recurrence alone — the same analytics q153's oracle replays
    def analyticGrid(baseId: Long): Array[Array[Int]] = {
      val q2Dc = graft.ops.Vp8Tables.DcQ(20) * 2
      def delta(mb: Int): Int = {
        val l = Math.floorMod(org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(baseId * 72 + mb, 42L), 9L).toInt - 4
        (((l * q2Dc + 3) >> 3) + 4) >> 3
      }
      val g = Array.ofDim[Int](8, 9)
      for (r <- 0 until 8; c <- 0 until 9) {
        val pred =
          if (r == 0 && c == 0) 128
          else if (r == 0) g(0)(c - 1)
          else if (c == 0) g(r - 1)(0)
          else (g(r - 1)(c) + g(r)(c - 1) + 1) >> 1
        g(r)(c) = math.max(0, math.min(255, pred + delta(r * 9 + c)))
      }
      g
    }
    for (id <- 0L until 12L) {
      val img = ImageDedup.decodeImage(ImageDedup.fixturePayload(id, 4))
      assert(img != null && img.getWidth == 144 && img.getHeight == 128)
      val g = analyticGrid(id)
      // per-MB flatness and exact values through the PUBLIC decode path
      for (r <- 0 until 8; c <- 0 until 9)
        assert((img.getRGB(c * 16 + 7, r * 16 + 9) & 0xff) == g(r)(c),
          s"id=$id mb($c,$r)")
      var want = 0L
      for (r <- 0 until 8; c <- 0 until 8)
        if (g(r)(c + 1) > g(r)(c)) want |= 1L << (r * 8 + c)
      assert(ImageDedup.dHashBits(img) == want, s"id=$id dhash")
    }
  }

  test("a VP8L webp of the fixture image dHashes identically to its PNG") {
    for (base <- 0L until 20L) {
      val png = ImageDedup.fixturePayload(base, 0)
      val webp = ImageDedup.fixturePayload(base, 7)
      val hPng = ImageDedup.dHashBits(ImageDedup.decodeImage(png))
      val hWebp = ImageDedup.dHashBits(ImageDedup.decodeImage(webp))
      assert(hPng == hWebp, s"base $base")
    }
  }

  test("a tiff header classifies as tiff (both byte orders)") {
    val ii = Array[Byte]('I', 'I', 42, 0, 1, 2, 3, 4)
    val mm = Array[Byte]('M', 'M', 0, 42, 1, 2, 3, 4)
    val got = Seq(ii, mm).zipWithIndex.map { case (b, i) => (i, b) }
      .toDF("i", "img")
      .select(ImageDedup.imageFormat(col("img"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("tiff", "tiff"))
  }

  test("hashCorpusPng content edits perturb at most editRows hash bits") {
    for (base <- 0L until 50L; edits <- 1 to 3) {
      val h0 = ImageDedup.dHashBits(decode(ImageDedup.hashCorpusPng(base, 0)))
      val h1 = ImageDedup.dHashBits(decode(ImageDedup.hashCorpusPng(base, 0, edits)))
      val ham = java.lang.Long.bitCount(h0 ^ h1)
      assert(ham <= edits, s"base=$base edits=$edits hamming=$ham")
    }
    // and the edit composes with a brightness shift (the genB rig shape)
    val a = ImageDedup.dHashBits(decode(ImageDedup.hashCorpusPng(7, 0)))
    val b = ImageDedup.dHashBits(decode(ImageDedup.hashCorpusPng(7, 3, 3)))
    assert(java.lang.Long.bitCount(a ^ b) <= 3)
  }
}
