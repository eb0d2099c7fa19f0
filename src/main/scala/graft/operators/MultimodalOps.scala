package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal plumbing (SURVEY §2.F): opaque binary payload columns +
  * typed metadata, with the decode step stubbed.
  *
  * What is REAL here — and what the spec tests — is the Spark-side
  * shape a multimodal pipeline needs at 100 TB: a `binary` payload
  * column carried through the scan, a typed per-record metadata schema,
  * and partition-wise batched decoding via `mapPartitions` over a typed
  * Dataset (the Scala analog of `mapInPandas`: the decoder library is
  * initialized once per partition, not once per row, and rows stream
  * through without materializing the partition).
  *
  * What is FAKE: the decoder itself. This container has no image/audio
  * codecs, so `decodeStub` derives deterministic pseudo-metadata from
  * the payload bytes. Swapping in a real codec changes ONLY the body of
  * `decodeStub`.
  */
object MultimodalOps {

  /** One media object: id + modality tag + opaque payload. */
  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Typed decode output — the schema a downstream training pipeline
    * would select/filter on without touching payload bytes again.
    */
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
                       width: Int, height: Int, channels: Int,
                       duration_ms: Long, checksum: Long)

  /** FNV-1a over the payload — a stand-in for decoder output that is
    * deterministic, order-independent of partitioning, and cheap.
    */
  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** STUB — deterministic fake decoder. A real implementation would
    * hand `payload` to libjpeg/ffmpeg here; the container ships no
    * codecs, so dimensions/duration are derived from the payload hash.
    */
  private def decodeStub(r: MediaRecord): MediaMeta = {
    val h = fnv1a(r.payload)
    def pick(shift: Int, mod: Int, base: Int) =
      base + (((h >>> shift) % mod + mod) % mod).toInt
    r.media_type match {
      case "image" => MediaMeta(r.doc_id, r.media_type, r.payload.length,
        pick(0, 4096, 16), pick(12, 4096, 16), 3, 0L, h)
      case "audio" => MediaMeta(r.doc_id, r.media_type, r.payload.length,
        0, 0, pick(0, 2, 1), pick(8, 600000, 1000), h)
      case _       => MediaMeta(r.doc_id, r.media_type, r.payload.length,
        pick(0, 1920, 320), pick(12, 1080, 240), 3, pick(24, 7200000, 1000), h)
    }
  }

  /** The media table: documents re-cast as binary payloads with a
    * modality tag (source-derived). At production scale this is the
    * real ingest table — binary column + partition-friendly id.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(xxhash64(col("source")), lit(3)) + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"))

  /** f1: decode → typed metadata. mapPartitions keeps the decode
    * batched per partition; everything before/after stays a declarative
    * plan (scan prunes to the 3 needed columns; the result is a normal
    * DataFrame downstream ops can filter/join/aggregate).
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .as[MediaRecord]
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .orderBy(col("doc_id"))
  }
}
