package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ExactSubstrDedup

class ExactSubstrSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private val L = 4

  /** Brute-force ground truth: position j of doc d is dropped iff some
    * L-token window covering j has text occurring >= 2 times corpus-wide.
    */
  private def brute(corpus: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val occ = for {
      (id, ws) <- toks.toSeq
      i <- 0 to ws.length - L
    } yield (id, i, ws.slice(i, i + L).mkString(" "))
    val counts = occ.groupBy(_._3).map { case (g, os) => g -> os.size }
    corpus.map { case (id, _) =>
      val ws = toks(id)
      val dupStarts = (0 to ws.length - L)
        .filter(i => counts(ws.slice(i, i + L).mkString(" ")) >= 2)
      val dropped = dupStarts.flatMap(i => i until i + L).toSet
      val runs = dropped.toSeq.sorted
        .foldLeft(List.empty[(Int, Int)]) {
          case ((s, e) :: rest, j) if j == e + 1 => (s, j) :: rest
          case (acc, j)                          => (j, j) :: acc
        }
      val kept = ws.zipWithIndex.collect { case (w, j) if !dropped(j) => w }
      id -> ((ws.length.toLong, dropped.size.toLong, runs.size.toLong,
        kept.mkString(" ")))
    }.toMap
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def run(corpus: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] =
    ExactSubstrDedup.report(corpus.toDF("doc_id", "text"), "doc_id", "text", L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))))
      .toMap

  private def check(corpus: Seq[(Long, String)]): Unit = {
    val got = run(corpus)
    val want = brute(corpus)
    assert(got.keySet == want.keySet)
    for (id <- want.keySet) {
      val (nt, nd, ns, cleanText) = want(id)
      assert(got(id)._1 == nt, s"n_tokens doc $id")
      assert(got(id)._2 == nd, s"n_dropped doc $id")
      assert(got(id)._3 == ns, s"n_dup_spans doc $id")
      assert(got(id)._4 == md5hex(cleanText), s"clean_md5 doc $id")
    }
  }

  test("unaligned cross-doc duplicate is removed from both docs (tile dedup would miss it)") {
    // the shared 5-token run sits at offset 0 in doc 1, offset 3 in doc 2:
    // no fixed tiling aligns them, stride-1 grams do
    val shared = "alpha beta gamma delta epsilon"
    val corpus = Seq(
      1L -> s"$shared tail1 tail2 tail3",
      2L -> s"pre1 pre2 pre3 $shared post1")
    val got = run(corpus)
    assert(got(1L)._2 == 5 && got(2L)._2 == 5)
    assert(got(1L)._3 == 1 && got(2L)._3 == 1)
    check(corpus)
  }

  test("within-document repetition counts as duplication") {
    val corpus = Seq(
      1L -> "x1 x2 x3 x4 mid x1 x2 x3 x4",
      2L -> "totally different words here indeed")
    val got = run(corpus)
    assert(got(1L)._2 == 8 && got(1L)._3 == 2) // both copies drop, 'mid' survives
    assert(got(2L)._2 == 0)
    check(corpus)
  }

  test("docs shorter than L never emit grams and are never dropped") {
    val corpus = Seq(1L -> "a b c", 2L -> "a b c", 3L -> "")
    val got = run(corpus)
    assert(got.values.forall(_._2 == 0))
    // untouched docs keep their original text hash
    assert(got(1L)._4 == md5hex("a b c"))
    assert(got(3L)._4 == md5hex(""))
    check(corpus)
  }

  test("overlapping duplicate windows merge into one maximal span") {
    // doc 1 and 2 share a 6-token run: 3 overlapping 4-gram starts merge to one span of 6
    val corpus = Seq(
      1L -> "s1 s2 s3 s4 s5 s6 u1 u2 u3",
      2L -> "v1 v2 s1 s2 s3 s4 s5 s6")
    val got = run(corpus)
    assert(got(1L)._2 == 6 && got(1L)._3 == 1)
    assert(got(2L)._2 == 6 && got(2L)._3 == 1)
    check(corpus)
  }

  test("fully-duplicated document cleans to the empty string") {
    val corpus = Seq(1L -> "d1 d2 d3 d4 d5", 2L -> "d1 d2 d3 d4 d5")
    val got = run(corpus)
    assert(got(1L)._2 == 5 && got(1L)._4 == md5hex(""))
    check(corpus)
  }

  test("randomized corpus matches brute force") {
    val rnd = new scala.util.Random(42)
    // small vocabulary forces collisions; lengths straddle L
    val corpus = (1L to 40L).map { id =>
      val n = 2 + rnd.nextInt(20)
      id -> Seq.fill(n)(s"w${rnd.nextInt(6)}").mkString(" ")
    }
    check(corpus)
  }

  test("forced Bloom position-prune path equals the broadcast-join path") {
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 60L).map { id =>
      val n = 2 + rnd.nextInt(24)
      id -> Seq.fill(n)(s"w${rnd.nextInt(5)}").mkString(" ")
    }
    def rows(bloom: Boolean, minDup: Long) =
      ExactSubstrDedup.report(corpus.toDF("doc_id", "text"), "doc_id", "text",
        L, bloomPrune = bloom, bloomMinDup = minDup)
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    // bloomMinDup = 1 forces the prune even on this tiny dup side; the
    // answer must be identical to the plain-join plan
    assert(rows(bloom = true, minDup = 1L) ===
      rows(bloom = false, minDup = 1L))
    check(corpus) // and both match brute force via the default path
  }
}
