package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter aggregation over 64-bit fingerprints — the membership
  * sketch a crawler-scale pipeline keeps in front of its history join
  * (c12; reference behavior: PasarDAssist's query layer has no
  * incremental dedup gate, this is the training-data extension ops).
  *
  * `bloom_agg(fp)` over a group folds every fingerprint into one
  * `org.apache.spark.util.sketch.BloomFilter` (the public Spark sketch
  * — the same structure `DataFrameStatFunctions.bloomFilter` builds,
  * but as a groupBy aggregator so ONE PASS builds a bloom PER SHARD
  * instead of one driver-side global filter). State per group is the
  * fixed `optimalNumOfBits(expectedItems, fpp)` bit array — it does
  * NOT grow with the group's row count, so a shard of a billion
  * fingerprints costs the same buffer as a shard of ten; map-side
  * partial aggregation folds locally and shuffles only nShards
  * serialized filters.
  *
  * The sketch's contract (and what c12 relies on): NO false negatives
  * ever — `mightContainLong` returning false proves the fingerprint
  * was not added on any partition (merge is bitwise OR of identically
  *-parameterized filters); false positives occur at ≈`fpp` and are
  * resolved downstream by an exact verify join. Verified against a
  * Scala Set model in KernelPropertySpec.
  */
class BloomAggregator(expectedItems: Long, fpp: Double)
    extends Aggregator[Long, BloomFilter, Array[Byte]] {
  require(expectedItems >= 1, s"expectedItems must be >= 1, got $expectedItems")
  require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")

  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)

  override def reduce(b: BloomFilter, x: Long): BloomFilter = {
    b.putLong(x); b
  }

  // identical (expectedItems, fpp) on both sides by construction, so
  // the IncompatibleMergeException arm is unreachable
  override def merge(x: BloomFilter, y: BloomFilter): BloomFilter =
    x.mergeInPlace(y)

  override def finish(b: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  // BloomFilterImpl is java.io.Serializable; the buffer only
  // serializes at the partial/final shuffle boundary (object-hash
  // aggregation keeps it as a live object per group within a task)
  override def bufferEncoder: Encoder[BloomFilter] =
    Encoders.javaSerialization[BloomFilter]
  override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
}

object BloomAgg {
  /** `fn(items, fpp)(col)` — serialized bloom of the group's longs. */
  def fn(expectedItems: Long, fpp: Double): Column => Column = {
    val f = udaf(new BloomAggregator(expectedItems, fpp))
    (c: Column) => f(c)
  }

  /** Inverse of the aggregator's `finish`. */
  def deserialize(bytes: Array[Byte]): BloomFilter = BloomFilter.readFrom(bytes)
}
