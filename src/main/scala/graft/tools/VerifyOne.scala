package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: dump named queries' results to parquet for a local
  * DuckDB-oracle compare (the driver's Verify, scoped to a few names).
  * Usage: runMain graft.tools.VerifyOne <sfDir> <outDir> <names...>
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val spark = GraftSession.build("graft-verify-one")
    args.drop(2).foreach { n =>
      SparkEntry.queries(n)(spark, dir)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$n")
      println(s"[verify-one] wrote $out/$n")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSqlFor(spark, dir)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"), json)
    spark.stop()
  }
}
