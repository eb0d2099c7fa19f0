package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text helpers — all native `functions._` / SQL-expression built
  * (codegen'd; no Scala UDF anywhere on the hot path). Every helper has
  * an exact DuckDB-SQL twin so oracle queries can reproduce it.
  */
object TextFns {

  /** Whitespace tokens (single-space split — the synthetic corpus is
    * single-space separated; duckdb twin: string_split(text, ' ')).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword-ish tokens: alnum runs (duckdb twin:
    * regexp_extract_all(text, '[a-zA-Z0-9]+')).
    */
  def reTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-zA-Z0-9]+"), lit(0))

  /** Word n-gram shingles of the token array: sliding windows joined by
    * a space. Native: transform over an index sequence + slice.
    */
  def shingles(toks: Column, n: Int): Column = {
    // indices 1..(len-n+1); slice is 1-based
    val count = greatest(size(toks) - (n - 1), lit(0))
    transform(sequence(lit(1), count),
              i => concat_ws(" ", slice(toks, i, lit(n))))
  }

  /** Deterministic 64-bit hash of a column (xxhash64 with fixed seed —
    * stable across partitions, sessions and cluster sizes).
    */
  def h64(c: Column): Column = xxhash64(c)

  /** MinHash signature: for permutation seeds 0..(k-1), the minimum of
    * xxhash64(shingle, seed) over the doc's shingle set. Returns an
    * array<long> of length k. Hot path is native transform/aggregate —
    * fully codegen'd, no UDF.
    */
  def minhash(shingleArr: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      seed => array_min(transform(shingleArr, s => xxhash64(s, seed))))

  /** SimHash-64 over token hashes: for each of the 64 bits, sum the
    * +1/-1 contributions of every token's hash bit; bit set iff the sum
    * is positive. Native bit arithmetic via aggregate over the token
    * array.
    */
  def simhash64(toks: Column): Column = {
    val hashes = transform(toks, t => xxhash64(t))
    // For bit b: tokens with bit set minus tokens with bit unset; the
    // 64 bit positions unroll statically into one codegen'd expression.
    (0 until 64).map { b =>
      when(aggregate(hashes, lit(0L),
             (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1, lit(1L))
                               .otherwise(lit(-1L))) > 0,
           shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, x) => a.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
