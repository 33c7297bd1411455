package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Phonetic keys for entity-resolution blocking: a simplified American
  * Soundex (h/w treated as separators like vowels) built entirely from
  * translate / regexp_replace / substring — the SAME chain runs as
  * codegen'd Spark expressions and as the DuckDB oracle SQL, so keys
  * are engine-independent by construction. (DuckDB's regex engine is
  * RE2 — no backreferences — so the run-collapse step is an unrolled
  * per-digit replace chain instead of `(\d)\1+`.)
  *
  * Algorithm: uppercase, strip non-letters, map letters to digit
  * classes (BFPV→1 CGJKQSXZ→2 DT→3 L→4 MN→5 R→6, vowels+HWY→0),
  * collapse adjacent equal codes (including the first letter's code —
  * "Pfister"→P236), drop the first position, strip separators, first
  * letter + first 3 digits right-padded with 0.
  *
  * Blocking shape at scale: the key is a pure scan-side expression; a
  * phonetic self-join is an equi-join on the key (shuffle or broadcast
  * by block), never all-pairs — same contract as the q-gram blocking
  * in FuzzyJoin.
  */
object Phonetic {

  private val Letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val Codes   = "01230120022455012623010202"

  /** The soundex key of `c`, or empty string for inputs with no
    * letters.
    */
  def soundex(c: Column): Column = {
    val u = regexp_replace(upper(c), "[^A-Z]", "")
    val mapped = translate(u, Letters, Codes)
    val collapsed = (0 to 6).foldLeft(mapped) { (acc, d) =>
      regexp_replace(acc, s"$d+", d.toString)
    }
    val digits = regexp_replace(substring(collapsed, 2, 1000), "0", "")
    when(length(u) === 0, lit(""))
      .otherwise(rpad(concat(substring(u, 1, 1), substring(digits, 1, 3)), 4, "0"))
  }

  /** The identical chain as DuckDB SQL over column expression `e`. */
  def soundexSql(e: String): String = {
    val mapped = s"translate(regexp_replace(upper($e), '[^A-Z]', '', 'g'), " +
      s"'$Letters', '$Codes')"
    val collapsed = (0 to 6).foldLeft(mapped) { (acc, d) =>
      s"regexp_replace($acc, '$d+', '$d', 'g')"
    }
    val u = s"regexp_replace(upper($e), '[^A-Z]', '', 'g')"
    s"CASE WHEN length($u) = 0 THEN '' ELSE " +
      s"rpad(substr($u, 1, 1) || substr(regexp_replace(substr($collapsed, 2), " +
      s"'0', '', 'g'), 1, 3), 4, '0') END"
  }

  /** A fixed surname dictionary with known phonetic collisions
    * (Robert/Rupert, Smith/Smyth, ...) — the reference-lexicon pattern
    * (q41): a constant replayed as VALUES in the oracle so the blocked
    * join exercises real collisions even on a templated corpus.
    */
  val sampleNames: Seq[String] = Seq(
    "robert", "rupert", "rubin", "smith", "smyth", "smythe", "johnson",
    "jonson", "johnsen", "williams", "wilems", "brown", "braun", "jones",
    "johns", "miller", "muller", "davis", "davies", "garcia", "garza",
    "wilson", "willson", "anderson", "andersen", "thomas", "tomas",
    "taylor", "tailor", "moore", "muir", "martin", "martine", "lee",
    "leigh", "walker", "wagner", "hall", "howell", "allen", "alan",
    "young", "yung", "king", "kang", "wright", "write", "scott", "schott",
    "green", "greene", "baker", "becker", "adams", "addams", "nelson",
    "nielsen", "carter", "cartier", "mitchell", "michel")

  /** Phonetic blocking over the distinct values of `nameCol`: all
    * ordered pairs (a < b) sharing a soundex key. Output (a, b, key).
    */
  def soundexBlockJoin(df: DataFrame, nameCol: String): DataFrame = {
    val keyed = df.select(col(nameCol).as("v")).distinct()
      .select(col("v"), soundex(col("v")).as("key"))
      .filter(col("key") =!= "")
    keyed.as("x").join(keyed.as("y"),
        col("x.key") === col("y.key") && col("x.v") < col("y.v"))
      .select(col("x.v").as("a"), col("y.v").as("b"), col("x.key").as("key"))
  }
}
