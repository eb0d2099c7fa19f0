package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros, unix_millis}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Typed loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All loads are plain `spark.read.parquet` so Catalyst handles column
  * pruning and predicate pushdown into the scan — operators never read
  * more than the plan needs. At cluster scale these would be external
  * tables; nothing below assumes local paths beyond the `dir` prefix.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Canonical epoch-ms Column for the events `ts` field, adaptive to
    * the physical type the generator shipped: raw nanosecond longs
    * (older data, read under nanosAsLong — integer `div` keeps the
    * arithmetic exact above 2^53 ns where a double division would not)
    * or parquet µs timestamps (read as TIMESTAMP_NTZ; cast through
    * TimestampType is exact under the session's fixed UTC zone, and
    * `unix_millis` floors to ms exactly like the oracle's
    * `epoch_ms(ts)`). Every time-logic consumer derives ms through
    * here so a generator schema change lands in ONE place.
    */
  def epochMs(tsType: DataType): Column = tsType match {
    case LongType         => expr("ts div 1000000")
    case TimestampNTZType => unix_millis(col("ts").cast(TimestampType))
    case TimestampType    => unix_millis(col("ts"))
    case other => throw new IllegalArgumentException(
      s"unsupported events.ts type: $other")
  }

  /** µs-precision event-time Column (TimestampType, the most Spark's
    * watermark machinery holds) for the events `ts` field — the
    * streaming twin of [[epochMs]], same adaptive arms.
    */
  def eventTime(tsType: DataType): Column = tsType match {
    case LongType         => timestamp_micros(expr("ts div 1000"))
    case TimestampNTZType => col("ts").cast(TimestampType)
    case TimestampType    => col("ts")
    case other => throw new IllegalArgumentException(
      s"unsupported events.ts type: $other")
  }

  /** The events table with the canonical `ms` column appended — the
    * form every batch time-logic operator consumes.
    */
  def eventsMs(s: SparkSession, d: String): DataFrame = {
    val df = events(s, d)
    df.withColumn("ms", epochMs(df.schema("ts").dataType))
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
