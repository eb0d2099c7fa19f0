package graft

import org.apache.spark.sql.SparkSession

/** Session builder for the engine (SURVEY.md §3).
  *
  * AQE on (runtime partition coalescing + skew-join splitting), UTC
  * session time zone (oracle parity — the DuckDB compare assumes UTC),
  * shuffle partitions sized to the local core count rather than the
  * 200 default. At cluster scale only the master/partition settings
  * change; no operator below depends on these numbers.
  */
object GraftSession {

  /** Threads/partitions: driver sets SPARK_GRAFT_CPUS; default 4. */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def build(appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
      // parquet reader rejects; read it as a raw nanosecond long — all
      // event-time logic downstream is integer epoch-ms arithmetic.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
