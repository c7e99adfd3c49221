package graft

import java.nio.file.{Files, Paths}

/** Dumps SparkEntry.oracleSql as oracle_sql.json WITHOUT running Spark —
  * for fast local oracle-SQL iteration against an existing Verify output
  * directory (the Spark-side parquet is unchanged when only the oracle
  * text moves; re-running the whole Verify to re-check one SQL edit
  * wastes minutes). Same escaping as Verify's inline dump.
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir) = args
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
