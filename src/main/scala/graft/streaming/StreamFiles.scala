package graft.streaming

import org.apache.spark.sql.DataFrame

/** Shared file-stream plumbing for the bounded streaming replays: the
  * one-parquet-part-per-micro-batch writer and its helpers lived as
  * near-identical private copies in SynthQueries, BandedIndexSpec and
  * the scale benches — one definition here so staging-dir cleanup and
  * part-file selection cannot drift per copy.
  */
object StreamFiles {

  /** First .parquet part file in `dir`, closing the directory stream
    * (Files.list pins an fd until closed).
    */
  def firstParquet(dir: java.nio.file.Path): java.nio.file.Path = {
    val ls = java.nio.file.Files.list(dir)
    try ls.filter(p => p.toString.endsWith(".parquet")).findFirst.get
    finally ls.close()
  }

  /** Materialize `df` into `streamDir` as a single parquet part named
    * `sub.parquet` (one file = one maxFilesPerTrigger micro-batch),
    * deleting the _SUCCESS/.crc staging leftovers.
    */
  def writeOne(df: DataFrame, streamDir: java.nio.file.Path,
      sub: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft_$sub")
    df.repartition(1).write.mode("overwrite").parquet(tmp.toString)
    val part = firstParquet(tmp)
    java.nio.file.Files.move(part, streamDir.resolve(s"$sub.parquet"))
    deleteTree(tmp)
  }

  /** Recursive delete, best-effort (replays create tmp trees per run;
    * unbounded leftovers would grow /tmp by a checkpoint tree per
    * invocation).
    */
  def deleteTree(root: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(root)) {
      val all = Files.walk(root)
      try all.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => try { Files.deleteIfExists(p); () }
          catch { case _: Exception => () })
      finally all.close()
    }
  }
}
