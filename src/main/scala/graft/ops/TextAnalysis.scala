package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * language ID, quality scoring, fingerprinting. All pure column
  * expressions (whole-stage codegen; no UDFs in the hot path).
  */
object TextAnalysis {

  /** Whitespace token count; empty/whitespace-only text counts 0 (a bare
    * split("") yields [""], which would report a phantom token and let
    * empty documents slip past n_tokens >= 1 quality filters).
    */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword-regex token count: word pieces, digit runs, and
    * single punctuation marks — the pre-tokenizer split most BPE
    * vocabularies assume. A real tokenizer maps pieces to ids; the
    * count is the budget-relevant signal.
    */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0)))

  /** Stopword-hit count against a small lexicon — the lexicon arm of a
    * language-ID heuristic. Counted by token equality over a
    * punctuation-stripped split: the replace-length trick undercounts
    * adjacent repeats (shared delimiter space), misses words touching
    * punctuation, and breaks on regex metachars in the lexicon.
    */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column = {
    val tokens = split(lower(text), "\\W+")
    val lex = array(stopwords.map(lit): _*)
    size(filter(tokens, t => array_contains(lex, t))).cast("long")
  }

  /** Non-ASCII character count — the charset arm of language ID (CJK and
    * most non-Latin scripts light this up; `[ -~]` is printable ASCII in
    * every regex dialect).
    */
  def nonAsciiCount(text: Column): Column =
    length(regexp_replace(text, "[ -~]", "")).cast("long")

  /** N-gram-free language-ID heuristic: charset first, then English
    * stopword density. Returns a label column ("cjk-ish", "en-ish",
    * "latin-other").
    */
  def langIdGuess(text: Column): Column = {
    val n = length(text).cast("double")
    val nonAscii = nonAsciiCount(text).cast("double")
    val stops = stopwordHits(text, Seq("the", "a", "of", "and", "to", "in")).cast("double")
    val tokens = wsTokenCount(text).cast("double")
    when(nonAscii / greatest(n, lit(1d)) > 0.3, lit("cjk-ish"))
      .when(stops / greatest(tokens, lit(1d)) > 0.08, lit("en-ish"))
      .otherwise(lit("latin-other"))
  }

  /** Quality signals in integer milli-units: length, token count, mean
    * token length, punctuation and digit ratios. Integer outputs keep
    * downstream filters engine-portable (no float-ulp drift).
    */
  def qualitySignals(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val tokens = wsTokenCount(t)
    val letters = length(regexp_replace(t, "\\s", ""))
    val punct = length(t) - length(regexp_replace(t, "[^A-Za-z0-9\\s]", ""))
    val digits = length(t) - length(regexp_replace(t, "[0-9]", ""))
    df
      .withColumn("len_chars", length(t).cast("long"))
      .withColumn("n_tokens", tokens.cast("long"))
      .withColumn("avg_token_len_milli",
        floor(letters * 1000.0 / greatest(tokens, lit(1))).cast("long"))
      .withColumn("punct_ratio_milli",
        floor(punct * 1000.0 / greatest(length(t), lit(1))).cast("long"))
      .withColumn("digit_ratio_milli",
        floor(digits * 1000.0 / greatest(length(t), lit(1))).cast("long"))
  }

  /** Unigram language-model log-probability in integer milli-nats — the
    * classic LM-based quality filter for training corpora (low score =
    * gibberish or out-of-domain). The lexicon's log-probs are
    * precomputed on the driver as INTEGERS, so the score is a sum of
    * ints: exact, engine-portable, no float drift. OOV tokens get a
    * fixed penalty.
    */
  val oovPenaltyMilli: Long = -12000L
  lazy val unigramLogProbsMilli: Seq[(String, Long)] = {
    val total = graft.runtime.SeedData.words.map(_._2).sum
    graft.runtime.SeedData.words.map { case (w, freq) =>
      w -> math.round(math.log(freq / total) * 1000)
    }
  }

  def unigramScore(text: Column): Column = {
    val lex = map(unigramLogProbsMilli.flatMap { case (w, lp) =>
      Seq(lit(w), lit(lp))
    }: _*) // literal map: constant-folded once, cheap per-element lookup
    val tokens = split(lower(trim(text)), "\\s+")
    aggregate(tokens, lit(0L),
      (acc, t) => acc + coalesce(element_at(lex, t), lit(oovPenaltyMilli)))
  }

  /** Content fingerprint: md5 of case/whitespace-normalized text
    * (trimmed — consistent with rollingHash and Dedup.exact).
    */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Rolling chained hash over the token stream: h = xxhash64(h, token).
    * Order-sensitive (unlike the md5 bag fingerprint) and overflow-free
    * under ANSI mode (a `h*31 + x` polynomial would throw on long
    * overflow in Spark 4's default ANSI arithmetic).
    */
  def rollingHash(text: Column): Column =
    aggregate(split(lower(trim(text)), "\\s+"), lit(0L),
      (acc, tok) => xxhash64(acc, tok))
}
