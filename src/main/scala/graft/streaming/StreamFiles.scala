package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Spark's file source wants a DIRECTORY it can watch; the test data
  * ships each table as a single parquet file, so expose it through a
  * per-JVM temp directory via symlink. One entry per (dir, file) per
  * JVM (computeIfAbsent), marked deleteOnExit — repeated calls in a
  * long-lived session reuse it instead of littering the temp
  * filesystem. The file's schema is resolved once (batch footer read)
  * and cached alongside, since readStream requires an explicit schema.
  */
private[streaming] object StreamFiles {

  private val entries = new ConcurrentHashMap[(String, String), (Path, StructType)]()

  /** (watchable directory, pinned schema) for `dir/fileName`. */
  def dirAndSchema(spark: SparkSession, dir: String,
                   fileName: String): (Path, StructType) =
    entries.computeIfAbsent((dir, fileName), { key: (String, String) =>
      val (d, f) = key
      val schema = spark.read.parquet(s"$d/$f").schema
      val p = Files.createTempDirectory("graft-stream")
      p.toFile.deleteOnExit()
      val link = p.resolve(f)
      Files.createSymbolicLink(link, Paths.get(s"$d/$f"))
      link.toFile.deleteOnExit()
      (p, schema)
    })
}
