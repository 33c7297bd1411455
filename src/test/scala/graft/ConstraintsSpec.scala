package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Constraints
import graft.ops.Constraints._

class ConstraintsSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame,
      rules: Seq[Rule]): Map[String, Long] =
    Constraints.validate(df, rules).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("row-local rules: nulls, ranges, predicates — nulls violate") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (2L, 99L), (null, 5L), (4L, null)).toDF("a", "b")
    val got = report(df, Seq(
      NotNull("a_nn", "a"),
      InRange("b_rng", "b", 1, 50),
      Check("a_lt_b", "a < b")))
    assert(got == Map("a_nn" -> 1L, "b_rng" -> 2L, "a_lt_b" -> 2L))
  }

  test("uniqueness counts every member of a duplicated key group") {
    val df = Seq((1, "x"), (1, "y"), (2, "z"), (3, "w"), (3, "v"), (3, "u"))
      .toDF("k", "v")
    val got = report(df, Seq(Unique("k_uniq", Seq("k"))))
    assert(got == Map("k_uniq" -> 5L)) // 2 rows of k=1 + 3 rows of k=3
  }

  test("functional dependency counts keys with >1 distinct rhs") {
    val df = Seq((1, "a", 1), (1, "a", 2), (2, "b", 1), (2, "c", 1), (3, "d", 9))
      .toDF("k", "attr", "other")
    val got = report(df, Seq(FunctionalDep("k_attr", Seq("k"), Seq("attr"))))
    assert(got == Map("k_attr" -> 1L)) // only k=2 violates
  }

  test("referential integrity counts orphans including null FKs") {
    val dim = Seq(10L, 20L).toDF("pk")
    val df = Seq[java.lang.Long](10L, 10L, 30L, null).toDF("fk")
    val got = report(df, Seq(RefIntegrity("fk_ok", "fk", dim, "pk")))
    assert(got == Map("fk_ok" -> 2L)) // 30 and null
  }

  test("clean table yields all-zero report, one row per rule") {
    val dim = Seq(1L, 2L).toDF("pk")
    val df = Seq((1L, 5L), (2L, 6L)).toDF("k", "v")
    val got = report(df, Seq(
      NotNull("nn", "v"), InRange("rng", "v", 1, 10),
      Unique("uq", Seq("k")), FunctionalDep("fd", Seq("k"), Seq("v")),
      RefIntegrity("ri", "k", dim, "pk")))
    assert(got == Map("nn" -> 0L, "rng" -> 0L, "uq" -> 0L, "fd" -> 0L, "ri" -> 0L))
  }
}
