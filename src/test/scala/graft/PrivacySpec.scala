package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Mmr, Privacy}

/** Privacy/compliance operators (k-anonymity audit, keyed
  * pseudonymization, deterministic-DP counts) and MMR diversification.
  */
class PrivacySpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("k-anonymity audit: class sizes, distinct-sensitive counts, flags") {
    val df = Seq(
      // class (A, x): 3 rows, 2 sensitive values
      ("A", "x", "s1"), ("A", "x", "s1"), ("A", "x", "s2"),
      // class (B, y): 1 row -> k-violation, l-violation
      ("B", "y", "s1"),
      // class (C, z): 3 rows, 3 sensitive values
      ("C", "z", "s1"), ("C", "z", "s2"), ("C", "z", "s3"),
    ).toDF("qi1", "qi2", "sens")
    val out = Privacy.kAnonymityAudit(df, Seq("qi1", "qi2"), col("sens"), k = 2, l = 2)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5))).sortBy(_._1)
    assert(out.toSeq == Seq(
      ("A", 3L, 2L, 1, 1),
      ("B", 1L, 1L, 0, 0),
      ("C", 3L, 3L, 1, 1)))
  }

  test("pseudonymization: deterministic, join-preserving, collision-free on the key domain") {
    val ids = (0L until 5000L)
    val df = ids.toDF("id")
    val toks = df.select(Privacy.pseudonymizeKey(col("id"), 99L).as("t"))
      .collect().map(_.getLong(0))
    // injective on the domain (tokens preserve joins exactly)
    assert(toks.distinct.length == ids.length)
    // deterministic: same salt -> same tokens; different salt -> different mapping
    val again = df.select(Privacy.pseudonymizeKey(col("id"), 99L).as("t"))
      .collect().map(_.getLong(0))
    assert(toks.toSeq == again.toSeq)
    val other = df.select(Privacy.pseudonymizeKey(col("id"), 100L).as("t"))
      .collect().map(_.getLong(0))
    assert(toks.toSeq != other.toSeq)
  }

  test("geometric thresholds: monotone, exhaustive, symmetric around zero") {
    val ths = Privacy.geometricThresholds(1.0, 20)
    assert(ths.length == 41)
    assert(ths.map(_._1) == ths.map(_._1).sorted)
    assert(ths.last._1 == 4294967296L && ths.last._2 == 20)
    assert(ths.map(_._2) == (-20 to 20))
    // mass at noise=0 should be the largest single bucket
    val widths = (0L +: ths.map(_._1)).sliding(2).map(w => w(1) - w(0)).toSeq
    assert(widths((-20 to 20).indexOf(0)) == widths.max)
  }

  test("dp noisy counts: bounded noise, clamped at zero, partitioning-invariant") {
    val df = (0L until 10000L).map(i => (i, i % 40)).toDF("id", "grp")
    val out = Privacy.dpNoisyCounts(df, "grp", seed = 7L, eps = 1.0, cap = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 40)
    out.foreach { case (_, released) =>
      assert(released >= 0L && math.abs(released - 250L) <= 20L) }
    // deterministic under any partitioning
    val out2 = Privacy.dpNoisyCounts(df.repartition(13), "grp", seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == out2)
    // noise actually varies across groups (not all zero)
    val noises = out.map { case (g, r) => r - 250L }
    assert(noises.toSet.size > 3)
  }

  test("mmr: picks the relevant-but-diverse set, not the top-k by relevance") {
    // query-side candidates: a and b are near-duplicates with the top
    // relevance, c is slightly less relevant but orthogonal. Top-2 by
    // relevance = {a, b}; MMR at lambda=0.7 must pick {a, c}.
    val cands = Seq(
      (1L, 10L, 990000L, Seq(1.0, 0.0, 0.01)),  // a
      (1L, 11L, 980000L, Seq(1.0, 0.0, 0.02)),  // b ~ a
      (1L, 12L, 900000L, Seq(0.0, 1.0, 0.0)),   // c orthogonal
    ).toDF("qid", "id", "rel", "v")
    val out = Mmr.diversify(cands, "qid", "id", "rel", "v", k = 2, lambdaPermille = 700L)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 10L), (2L, 12L)))
  }

  test("wav: encode/decode round-trip recovers rate, channels, samples, peak, energy") {
    import graft.ops.Multimodal
    val samples = Array[Short](100, -200, 300, -32768)
    val bytes = Multimodal.wavBytes(samples, 8000, 1)
    assert(bytes.length == 44 + 8)
    val Some((rate, ch, n, peak, sumSq)) = Multimodal.decodeWav(bytes)
    assert((rate, ch, n) == ((8000, 1, 4L)))
    assert(peak == 32768L)
    assert(sumSq == 100L * 100 + 200L * 200 + 300L * 300 + 32768L * 32768)
    // stereo: per-channel sample count halves
    val st = Multimodal.decodeWav(Multimodal.wavBytes(samples, 44100, 2)).get
    assert(st._2 == 2 && st._3 == 2L)
  }

  test("wav: unknown chunks between fmt and data are skipped; corrupt payloads reject") {
    import graft.ops.Multimodal
    val samples = Array[Short](1, 2, 3)
    val plain = Multimodal.wavBytes(samples, 16000, 1)
    // splice a LIST chunk (8 + 6 bytes, word-aligned) before "data"
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val spliced = plain.slice(0, 36) ++ listChunk ++ plain.slice(36, plain.length)
    // fix the RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    assert(Multimodal.decodeWav(spliced) == Multimodal.decodeWav(plain))
    // corrupt: truncated header, non-RIFF garbage, declared size past EOF
    assert(Multimodal.decodeWav(plain.slice(0, 20)) == None)
    assert(Multimodal.decodeWav(Array.fill[Byte](64)(7)) == None)
    val bad = plain.clone()
    java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 100000)
    assert(Multimodal.decodeWav(bad) == None)
    // sample rate 0 in the fmt chunk: must reject (audioFeatures divides
    // by the rate — a Some here would kill the scan, not degrade to null)
    val zeroRate = plain.clone()
    java.nio.ByteBuffer.wrap(zeroRate).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(24, 0)
    assert(Multimodal.decodeWav(zeroRate) == None)
  }

  test("audioFeatures: features for valid wavs, nulls for corrupt payloads") {
    import graft.ops.Multimodal
    val good = Multimodal.wavBytes(Array[Short](10, -20), 1000, 1)
    val df = Seq((1L, good), (2L, Array.fill[Byte](10)(1))).toDF("id", "payload")
    val rows = Multimodal.audioFeatures(df, "payload").orderBy("id").collect()
    assert(rows(0).getInt(2) == 1000 && rows(0).getLong(4) == 2L &&
      rows(0).getLong(5) == 2L * 1000 / 1000 && rows(0).getLong(6) == 20L &&
      rows(0).getLong(7) == 500L)
    assert(rows(1).isNullAt(2) && rows(1).isNullAt(6))
  }

  test("mmr: rank-1 is argmax relevance, scores follow the integer formula") {
    val cands = Seq(
      (5L, 1L, 500000L, Seq(1.0, 0.0)),
      (5L, 2L, 600000L, Seq(0.0, 1.0)),
    ).toDF("qid", "id", "rel", "v")
    val rows = Mmr.diversify(cands, "qid", "id", "rel", "v", k = 2, lambdaPermille = 700L)
      .orderBy("rnk").collect()
    assert(rows(0).getLong(2) == 2L && rows(0).getLong(3) == 700L * 600000L)
    // second pick: sim(1,2)=0 -> score = 700*rel
    assert(rows(1).getLong(2) == 1L && rows(1).getLong(3) == 700L * 500000L)
  }
}
