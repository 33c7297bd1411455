package graft.tools

import java.nio.file.{Files, Paths}

/** Writes SparkEntry.oracleSql as JSON without running any Spark query —
  * lets tools/time_oracles.py profile the DuckDB replay cost in
  * isolation (the driver-gate budget work: VERDICT r8 item 1).
  */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracles to $out")
  }
}
