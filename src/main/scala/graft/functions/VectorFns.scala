package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector helpers over `array<float>` columns — native
  * zip_with/aggregate expressions (codegen'd; no UDF, no MLlib vector
  * conversion). Fold order is array order, so results are bit-stable
  * across partitionings and cluster sizes.
  */
object VectorFns {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 folded into [-1, 1]. No RNG state — the same plane is
    * regenerated identically on every executor, session, and scale.
    */
  private def planeComponent(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p), d), lit(2001L)) - lit(1000L)).cast("double") / 1000.0

  /** Random-hyperplane LSH signature: bit p = sign(vec · plane_p),
    * packed into a long. For unit-ish vectors, P(bit differs) =
    * angle/π, so near-duplicate vectors share most bits.
    */
  def lshSig(vec: Column, nPlanes: Int): Column = {
    require(nPlanes <= 64)
    val dims = sequence(lit(0), size(vec) - 1)
    (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, dims, (x, d) => x * planeComponent(p, d)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce((a, x) => a.bitwiseOR(x))
  }

  /** Band key extraction from a packed LSH signature: band b of
    * `bits`-wide bands.
    */
  def lshBand(sig: Column, b: Int, bits: Int): Column =
    shiftright(sig, b * bits).bitwiseAND(lit((1L << bits) - 1))
}
