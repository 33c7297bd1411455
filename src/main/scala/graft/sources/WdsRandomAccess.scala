package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index-driven POINT ACCESS to WebDataset shards — the serving path
  * that completes the `wds` connector the way [[WarcRandomAccess]]
  * completes `warc`: "give me these N samples out of a petabyte of
  * shards" must cost N bounded seeks, not a corpus scan. The sink's
  * `<shard>.idx` sidecar (`offset<TAB>key` per sample) is the lookup
  * table; sample CONTIGUITY (guaranteed by the sink's required
  * clustering+ordering) is what makes "seek to the offset, read
  * members while the key matches" complete and exact.
  *
  * Scale shape: the idx table is a plain distributed text read (one
  * small sidecar per shard — no payload bytes touched during lookup
  * planning); the key-to-sample join runs broadcast when the wanted
  * side is small (it is — that's the point of a point lookup); and
  * `fetch` repartitions hits BY SHARD and sorts within partitions by
  * offset, so each task opens each shard once and seeks monotonically
  * forward — sequential-friendly IO, never a whole-shard read.
  */
object WdsRandomAccess {

  final case class Fetched(shard: String, key: String, ext: String,
      name: String, size: Long, payload: Array[Byte])

  /** Shields the per-shard seekable stream from a nested reader's
    * close — the stream is reused across that shard's lookups.
    */
  private final class NonClosingInputStream(in: java.io.InputStream)
      extends java.io.FilterInputStream(in) {
    override def close(): Unit = ()
  }

  /** The idx sidecars under `dir` as a DataFrame
    * (shard, offset, key).
    */
  def idx(spark: SparkSession, dir: String): DataFrame = {
    val parts = split(col("value"), "\t")
    spark.read.format("text").load(s"$dir/*.idx")
      .select(input_file_name().as("__f"), col("value"))
      .filter(!col("value").startsWith("#") && length(col("value")) > 0)
      .select(
        // input_file_name() yields file:///abs/path — strip the scheme
        regexp_replace(col("__f"), "^file:(//)?", "").as("__p"),
        parts.as("__parts"))
      .select(
        regexp_replace(col("__p"), "\\.idx$", "").as("shard"),
        element_at(col("__parts"), 1).cast("long").as("offset"),
        element_at(col("__parts"), 2).as("key"))
  }

  /** Fetch exactly the samples named by `lookups` (shard, offset,
    * key): one positioned open per (shard, offset), members consumed
    * WHILE their sample key matches — contiguity bounds the walk to
    * the sample itself. A `mapPartitions` by design (the documented
    * last resort: point IO against an archive byte layout has no
    * declarative form); everything around it stays Catalyst-shaped.
    */
  def fetch(lookups: DataFrame): DataFrame = {
    val spark = lookups.sparkSession
    import spark.implicits._
    val ds = lookups
      .select(col("shard").cast("string"), col("offset").cast("long"),
        col("key").cast("string"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("offset"))
      .as[(String, Long, String)]
    ds.mapPartitions { it =>
      var file: String = null
      var ch: org.apache.hadoop.fs.FSDataInputStream = null
      def closeCh(): Unit = {
        if (ch != null) { ch.close(); ch = null; file = null }
      }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeCh()))
      it.flatMap { case (f, off, key) =>
        if (f != file) {
          closeCh()
          ch = ArchiveFs.open(f)
          file = f
        }
        ch.seek(off)
        // fresh buffer after every seek (a reused one would serve
        // stale read-ahead); the underlying stream stays open
        val in = new java.io.BufferedInputStream(
          new NonClosingInputStream(ch), 1 << 16)
        val ms = TarIo.members(in)
          .takeWhile(m => TarDataSource.splitKeyExt(m.name)._1 == key).toVector
        require(ms.nonEmpty, s"no sample '$key' at $f:$off")
        ms.map { m =>
          val (k, e) = TarDataSource.splitKeyExt(m.name)
          Fetched(f, k, e, m.name, m.size, m.payload)
        }
      }
    }.toDF()
  }
}
