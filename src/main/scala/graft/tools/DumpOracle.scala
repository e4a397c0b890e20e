package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: dump SparkEntry.oracleSql as JSON without running Spark
  * (for offline DuckDB type audits of every oracle mirror).
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
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
    Files.writeString(Paths.get(args(0)), json)
  }
}
