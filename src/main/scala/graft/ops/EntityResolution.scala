package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter record-linkage scoring (JASA 1969) — the decision
  * layer that sits on top of the blocking/candidate-generation ops
  * (ops/Phonetic soundex blocks, ops/FuzzyJoin edit-distance join):
  * per candidate pair, each field comparison contributes its
  * log-likelihood-ratio weight (agreement: log m/u > 0, disagreement:
  * log (1−m)/(1−u) < 0), the pair's score is the sum, and two
  * thresholds split match / possible (clerical review) / non-match.
  *
  * Weights are caller-supplied integer milli-units (precomputed from
  * the m/u probabilities — baked constants, so the scoring replays
  * exactly in any SQL engine). Scoring is a pure scan-side projection
  * over the candidate-pair table: no shuffle beyond what blocking
  * already did.
  */
object EntityResolution {

  /** One field comparison: `agree` is any boolean Column over the pair
    * row; weights in integer milli-units (wDisagree typically < 0).
    */
  final case class FieldRule(name: String, agree: Column,
      wAgree: Long, wDisagree: Long)

  /** Score candidate pairs and classify. Appends one `<name>_agree`
    * int flag per rule, the milli `score`, and the `decision`
    * (match / possible / non_match).
    */
  def score(pairs: DataFrame, rules: Seq[FieldRule],
      upperMilli: Long, lowerMilli: Long): DataFrame = {
    require(rules.nonEmpty && upperMilli >= lowerMilli)
    val flagged = rules.foldLeft(pairs) { (df, r) =>
      df.withColumn(s"${r.name}_agree", r.agree.cast("int"))
    }
    val total = rules.map(r =>
      when(col(s"${r.name}_agree") === 1, lit(r.wAgree))
        .otherwise(lit(r.wDisagree))).reduce(_ + _)
    flagged.withColumn("score", total)
      .withColumn("decision",
        when(col("score") >= upperMilli, lit("match"))
          .when(col("score") >= lowerMilli, lit("possible"))
          .otherwise(lit("non_match")))
  }
}
