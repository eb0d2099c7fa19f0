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

  private val dirs = new ConcurrentHashMap[(String, String), Path]()
  private val schemas = new ConcurrentHashMap[(String, String), StructType]()

  /** Watchable directory for `dir/fileName`. The table may be a single
    * parquet FILE (driver testdata) or a Spark-written DIRECTORY of
    * part-files (GenScale output): the file source doesn't recurse into
    * a symlinked subdirectory, so for the directory shape each
    * part-file is linked individually into the flat watch dir.
    *
    * ONE-SHOT SNAPSHOT by design: the link set is computed on first
    * access per (dir, file) key and cached for the JVM — part-files
    * added to the source directory later are NOT picked up. That is
    * exactly right for this adapter's only job (exposing a static
    * test table to a file-source stream); a live landing directory
    * doesn't need the adapter at all — point readStream at it
    * directly and the file source tails it natively.
    */
  def dir(dir: String, fileName: String): Path =
    dirs.computeIfAbsent((dir, fileName), { key: (String, String) =>
      val (d, f) = key
      val p = Files.createTempDirectory("graft-stream")
      p.toFile.deleteOnExit()
      val src = Paths.get(s"$d/$f")
      val parts: Seq[(Path, String)] =
        if (Files.isDirectory(src)) {
          val ls = Files.list(src)
          try {
            import scala.jdk.CollectionConverters._
            ls.iterator().asScala.toVector
              .filter(_.toString.endsWith(".parquet"))
              .map(q => q -> q.getFileName.toString)
          } finally ls.close()
        } else Seq(src -> f)
      parts.foreach { case (target, name) =>
        val link = p.resolve(name)
        Files.createSymbolicLink(link, target)
        link.toFile.deleteOnExit()
      }
      p
    })

  /** Watchable directory + footer-derived schema. The schema read is a
    * separate cache so callers with a STATIC schema (EventStream, whose
    * event-time derivation depends on exact field types) never pay the
    * batch footer read.
    */
  def dirAndSchema(spark: SparkSession, d: String,
                   fileName: String): (Path, StructType) = {
    val schema = schemas.computeIfAbsent((d, fileName),
      { key: (String, String) =>
        spark.read.parquet(s"${key._1}/${key._2}").schema
      })
    (dir(d, fileName), schema)
  }
}
