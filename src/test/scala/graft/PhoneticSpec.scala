package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Phonetic

/** Soundex key tests against the classic published examples (all of
  * which agree between standard and simplified h/w handling), plus
  * blocking behavior.
  */
class PhoneticSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def keys(ws: String*): Map[String, String] =
    ws.toDF("w").select(col("w"), Phonetic.soundex(col("w")).as("k"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("classic soundex examples") {
    val k = keys("Robert", "Rupert", "Tymczak", "Pfister", "Honeyman",
      "smith", "smyth", "O'Brien", "x", "123", "")
    assert(k("Robert") == "R163")
    assert(k("Rupert") == "R163")
    assert(k("Tymczak") == "T522")
    assert(k("Pfister") == "P236") // first-letter code collapses with F
    assert(k("Honeyman") == "H555")
    assert(k("smith") == "S530" && k("smyth") == "S530")
    assert(k("O'Brien") == "O165") // non-letters stripped
    assert(k("x") == "X000")      // padded
    assert(k("123") == "")        // no letters -> empty key
    assert(k("") == "")
  }

  test("blocked join pairs collisions only, ordered a < b") {
    val df = Seq("robert", "rupert", "smith", "smyth", "zzz").toDF("w")
    val got = Phonetic.soundexBlockJoin(df, "w")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("robert", "rupert"), ("smith", "smyth")))
  }
}
