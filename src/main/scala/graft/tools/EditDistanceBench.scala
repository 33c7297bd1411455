package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures plans/EditDistanceRewrite: the SAME 2-arg
  * `levenshtein(a,b) <= k` blocked join run in a session WITHOUT the
  * extension (full O(n·m) DP on every candidate pair) and one WITH it
  * (length-difference guard + banded 3-arg DP). Same data, same
  * result contract; the delta is the rule.
  *
  * Usage: runMain graft.tools.EditDistanceBench [sfDir] [reps]
  */
object EditDistanceBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)

    def run(label: String, withRule: Boolean): Unit = {
      val b = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
      val spark = (if (withRule) b.withExtensions(new graft.expr.GraftExtensions)
        else b).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      try {
        // longer strings than part names: concat 3 part-name words so the
        // full DP has real work per pair; block on first word to keep the
        // candidate join linear
        val names = spark.read.parquet(s"$sfDir/part.parquet")
          .select(col("p_partkey").as("id"),
            concat_ws(" ", col("p_name"), reverse(col("p_name")),
              col("p_name")).as("s"),
            split(col("p_name"), " ").getItem(0).as("blk"))
        var rows = -1L
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          rows = names.as("a").join(names.as("b"),
              col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
                levenshtein(col("a.s"), col("b.s")) <= 3)
            .count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"""{"which":"$label","pairs":$rows,"best_s":${times.min}%.3f}""")
      } finally spark.stop()
    }
    run("plain_2arg", withRule = false)
    run("rewritten", withRule = true)
  }
}
