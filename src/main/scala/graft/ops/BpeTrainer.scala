package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning (Sennrich et al., ACL 2016) — the
  * tokenizer-FITTING half of the pipeline (ops/TextAnalysis only
  * applies tokenizations). The classic formulation is already the
  * scale-correct one: merges are learned from the WORD-FREQUENCY
  * table, so the 100 TB corpus is scanned exactly ONCE (explode +
  * map-side-combinable word count); every one of the `nMerges`
  * iterations then runs on the dimension-sized word table — an
  * adjacent-pair explode weighted by word count, one
  * map-side-combinable pair-count aggregation, and a single-row argmax
  * collect (count desc, pair lexicographic asc: a total order, so the
  * learned merge list is deterministic and partitioning-invariant).
  * Nothing corpus-sized ever re-shuffles.
  *
  * The optional `maxVocab` cap bounds the word table for open-domain
  * corpora (keep the most frequent words — exactly what reference BPE
  * trainers do); the cap is a top-k by (count desc, word asc), again a
  * total order.
  *
  * No SQL engine replays an iterative argmax-and-rewrite loop, so the
  * driver query (g94) is rows-only by design; correctness is pinned in
  * ScalaTest against an independent single-machine reference
  * implementation on the classic lowest/newest/widest corpus, plus
  * partitioning invariance of the learned list.
  */
object BpeTrainer {

  // public: the Dataset encoder's generated projection code must
  // construct it reflectively
  final case class WordSyms(syms: Seq[String], cnt: Long)

  /** End-of-word marker, kept distinct from any real character. */
  val Eow = "</w>"

  /** Learn `nMerges` merges. Returns (rank, left, right, pairCount)
    * in learning order. Stops early when no pair reaches `minCount`.
    */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L, maxVocab: Int = 100000): Seq[(Int, String, String, Long)] = {
    require(nMerges >= 1 && nMerges <= 65536, s"nMerges out of range: $nMerges")
    val spark = df.sparkSession
    import spark.implicits._
    // the ONE corpus pass: word frequencies (bounded by maxVocab)
    val words = df
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxVocab)
    var syms: Dataset[WordSyms] = words
      .select(col("w"), col("cnt"))
      .as[(String, Long)]
      .map { case (w, c) => WordSyms(w.map(_.toString) :+ Eow, c) }
      .repartition(spark.sparkContext.defaultParallelism)
      .persist()
    syms.count() // materialize before the loop so each iteration is incremental
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      // weighted adjacent-pair counts over the word table
      val top = syms.flatMap(ws =>
          ws.syms.iterator.zip(ws.syms.iterator.drop(1))
            .map { case (a, b) => ((a, b), ws.cnt) })
        .groupByKey(_._1)
        .mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), c) => (a, b, c) }
        .toDF("l", "r", "c")
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty || top.head.getLong(2) < minCount) exhausted = true
      else {
        val (l, r, c) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((rank, l, r, c))
        val next = syms.map(ws => WordSyms(mergeOnce(ws.syms, l, r), ws.cnt)).persist()
        next.count()
        syms.unpersist()
        syms = next
        rank += 1
      }
    }
    syms.unpersist()
    merges.toSeq
  }

  /** Apply one learned merge greedily left-to-right (the BPE rewrite
    * step — deterministic).
    */
  private[ops] def mergeOnce(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Tokenize a text column with a learned merge list: per word, apply
    * every merge in rank order. Scan-side via a typed mapPartitions
    * seam (the merge list broadcasts with the closure); appends
    * `bpe_tokens` (array<string>) and `n_bpe_tokens`.
    */
  def applyMerges(df: DataFrame, textCol: String,
      merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val ordered = merges.sortBy(_._1).map(m => (m._2, m._3))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("bpe_tokens", ArrayType(StringType, containsNull = false)),
      StructField("n_bpe_tokens", LongType)))
    val txtIdx = df.schema.fieldIndex(textCol)
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val text = row.getString(txtIdx)
        val toks =
          if (text == null) Seq.empty[String]
          else text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
            var s: Seq[String] = w.map(_.toString) :+ Eow
            ordered.foreach { case (l, r) => s = mergeOnce(s, l, r) }
            s
          }
        Row.fromSeq(row.toSeq ++ Seq(toks, toks.length.toLong))
      }
    }
  }
}
