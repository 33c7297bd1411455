package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Dataset profiling — the ANALYZE TABLE equivalent a curation pipeline
  * runs before trusting a new drop: per-column row/null/distinct counts
  * (plus total string length for text columns), emitted as a tidy
  * (column, stat) table.
  *
  * Scale shape: ONE pass — a single aggregation computes every
  * column's stats simultaneously (count/sum are map-side combinable;
  * count-distinct rewrites to Spark's two-phase expand), and the
  * wide→tall melt runs on the 1-row aggregate result via stack().
  * Nothing scans the table per column.
  */
object Stats {

  /** Profile the given columns (default: all). Output:
    * (column, n, n_null, n_distinct, total_len) — total_len only for
    * string columns (null otherwise), so no engine-specific numeric
    * formatting ever feeds a stat.
    */
  def tableProfile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.schema.fields.map(_.name).toSeq
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      val isStr = df.schema(c).dataType == StringType
      Seq(
        count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        (if (isStr) sum(length(col(c)).cast("long")) else first(lit(null.asInstanceOf[String]).cast("long")))
          .as(s"__len_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __n_$c, __nulls_$c, __dist_$c, __len_$c").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.length}, $stackArgs) AS (column_name, n, n_null, n_distinct, total_len)")
  }
}
