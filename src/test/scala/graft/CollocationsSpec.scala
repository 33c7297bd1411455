package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Collocations

class CollocationsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  test("bigram counts and integer likelihood ratio match hand computation") {
    // corpus: "a b a b" (bigrams ab, ba, ab) + "a b" (ab) -> c(ab)=3, c(ba)=1
    // unigrams: a=3, b=3, N=6
    val df = Seq("a b a b", "a b", "").toDF("text")
    val got = Collocations.pmiBigrams(df, "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // lr_milli(ab) = 3*6*1000 div 9 = 2000; lr_milli(ba) = 1*6*1000 div 9 = 666
    assert(got == Map(
      ("a", "b") -> ((3L, 3L, 3L, 2000L)),
      ("b", "a") -> ((1L, 3L, 3L, 666L))))
  }

  test("minCount prunes and single-token docs contribute no pairs") {
    val df = Seq("x", "x y", "x y").toDF("text")
    val got = Collocations.pmiBigrams(df, "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("x", "y", 2L)))
  }
}
