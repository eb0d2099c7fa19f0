package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.build("graft-verify")
    new java.io.File(outDir).mkdirs()
    // dev-only narrowing (comma-separated names); the driver sets
    // nothing and always gets the full sweep. When active, say so
    // LOUDLY and drop a marker file into outDir — a narrowed dump must
    // never be mistakable for full-coverage evidence.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    only.foreach { names =>
      System.err.println(
        s"[verify] ***** NARROWED SWEEP (SPARK_GRAFT_VERIFY_ONLY): " +
          s"${names.toSeq.sorted.mkString(",")} — NOT full coverage *****")
      Files.writeString(Paths.get(s"$outDir/_NARROWED"),
        names.toSeq.sorted.mkString("\n") + "\n")
    }
    // and a FULL sweep into a reused dir must clear a stale marker
    if (only.isEmpty) Files.deleteIfExists(Paths.get(s"$outDir/_NARROWED"))
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSqlFor(spark, sfDir)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
