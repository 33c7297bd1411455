package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve experiment for the dedup family: replicate the sf0.1
  * documents corpus m× (each replica's words prefixed with a replica
  * tag so replicas are NEW content, not near-dups of each other) and
  * append a COMMON boilerplate sentence to every added doc — the
  * realistic 100 TB failure mode, where boilerplate shingles' document
  * frequency grows with the corpus.
  *
  * Reports, per (engine, scale): docs, candidate volume, output pairs,
  * seconds. The claims this demonstrates:
  *
  *   - UNCAPPED exact shingle pairing's candidate volume (sum over
  *     shingles of df·(df−1)/2) grows ~quadratically in corpus size —
  *     the boilerplate shingles dominate;
  *   - the df<=64 cap bounds per-shingle fan-out, so capped candidate
  *     volume grows ~linearly (it tracks the true near-dup structure);
  *   - minHashLsh banding keeps candidate pairs ~linear (buckets are
  *     threshold-matched, boilerplate does not collide whole bands);
  *   - embeddingNearDup multi-table SRP candidates likewise ~linear
  *     (replica vectors are sign-decorrelated, so they land in
  *     different buckets).
  *
  * Usage: runMain graft.tools.DedupScaleBench [sfDir] [scales]
  * (defaults: /root/testdata/sf0.1 and 1,2,5,10). Output: one JSON
  * line per measurement; paste the table into COVERAGE.md.
  */
object DedupScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("1,2,5,10").split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.expr.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val embs0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val nDocs0 = docs0.count()
    val boiler = "this document is provided as is without any warranty of any kind"

    /** Replica k: every word prefixed r<k>_ (new content, shares no
      * shingle with any other replica) + the common boilerplate tail
      * (df grows with corpus — the stop-shingle at scale).
      */
    def corpusAt(m: Int): DataFrame =
      (0 until m).map { k =>
        if (k == 0) docs0
        else docs0.select(
          (col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
          concat(
            array_join(transform(split(col("text"), " "), w => concat(lit(s"r${k}_"), w)), " "),
            lit(" " + boiler)).as("text"))
      }.reduce(_ unionAll _)

    /** Replica k of the embeddings: elementwise sign flip keyed by
      * (k, index) — norm-preserving, decorrelates replicas.
      */
    def embsAt(m: Int): DataFrame =
      (0 until m).map { k =>
        if (k == 0) embs0
        else embs0.select(
          (col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
          zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
            (x, i) => when(pmod(xxhash64(lit(k), i), lit(2)) === 0, x).otherwise(-x))
            .as("embedding"))
      }.reduce(_ unionAll _)

    def jline(engine: String, m: Int, nDocs: Long, cand: Long, pairs: Long,
        secs: Double): Unit =
      println(f"""{"engine":"$engine","scale":$m,"docs":$nDocs,"candidates":$cand,"pairs":$pairs,"sec":$secs%.1f}""")

    for (m <- scales) {
      val corpus = corpusAt(m).persist()
      val nDocs = corpus.count()
      // shingle index (same tokenization as exactShinglePairs)
      val sh = corpus
        .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
        .select(col("doc_id"),
          explode(graft.ops.Dedup.shinglesFromTokens(col("w"), 3)).as("sh"))
      val dfCounts = sh.groupBy("sh").agg(count(lit(1)).as("df")).persist()
      // candidate volume = sum df*(df-1)/2, with and without the cap
      def volume(maxDf: Long): Long =
        dfCounts.filter(col("df") <= maxDf)
          .agg(sum(floor(col("df") * (col("df") - 1) / 2).cast("long")))
          .collect()(0).getLong(0)
      val uncapped = volume(Long.MaxValue)
      val capped = volume(graft.ops.Dedup.DefaultMaxShingleDf)
      jline("exact_uncapped_volume", m, nDocs, uncapped, -1, 0.0)

      var t0 = System.nanoTime()
      val exactPairs = graft.ops.Dedup.exactShinglePairs(corpus, "doc_id", "text").count()
      jline("exact_capped", m, nDocs, capped, exactPairs, (System.nanoTime() - t0) / 1e9)

      t0 = System.nanoTime()
      val lshPairs = graft.ops.Dedup.minHashLsh(corpus, "doc_id", "text",
        threshold = 0.7).count()
      jline("minhash_lsh", m, nDocs, -1, lshPairs, (System.nanoTime() - t0) / 1e9)
      dfCounts.unpersist()
      corpus.unpersist()

      val embs = embsAt(m).persist()
      val nEmb = embs.count()
      t0 = System.nanoTime()
      val srpPairs = graft.ops.Dedup.embeddingNearDup(embs, "vec_id", "embedding",
        threshold = 0.99).count()
      jline("embed_neardup", m, nEmb, -1, srpPairs, (System.nanoTime() - t0) / 1e9)
      embs.unpersist()
    }
    spark.stop()
  }
}
