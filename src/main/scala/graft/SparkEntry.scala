package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{PipelineQueries, Queries, QueryDef}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    Queries.relational ++ PipelineQueries.pipeline ++ SynthQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q02_join_regions.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the
    * driver then records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}

/** Queries exercising the synthetic-data engine itself (no SQL oracle —
  * generator output is checked by rows>0 here and by ScalaTest
  * statistical/format oracles in src/test). Populated as the engine lands.
  */
object SynthQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
