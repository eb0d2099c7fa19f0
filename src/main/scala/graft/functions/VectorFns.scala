package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector helpers over `array<float>` columns — native
  * zip_with/aggregate expressions (codegen'd; no UDF, no MLlib vector
  * conversion). Fold order is array order, so results are bit-stable
  * across partitionings and cluster sizes.
  */
object VectorFns {

  /** Dot product — the custom codegen'd FloatVecDot expression (one
    * tight loop over the unsafe array data; no intermediate array).
    * Bit-identical to [[dotFold]], which stays as the composable
    * reference form the specs cross-validate.
    */
  def dot(a: Column, b: Column): Column = FloatVecDot(a, b)

  /** Reference implementation via zip_with + aggregate (same
    * left-to-right double fold; used to cross-check FloatVecDot).
    * Elements are widened to double BEFORE the multiply — a bare
    * float*float would multiply in float precision, diverging from
    * both FloatVecDot and the DuckDB oracle's ::DOUBLE[] math.
    */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic hyperplane for plane index p: components in [-1, 1]
    * from a fixed-seed PRNG, embedded in the plan as LITERAL arrays —
    * computed once at plan build, not per row (the first version
    * derived each component from xxhash64 per row: 768 hashes/row).
    * Identical on every executor, session, and scale.
    */
  private def plane(p: Int, dims: Int): Column =
    array(planeValues(p, dims).map(lit): _*)

  /** The plane's raw component values — public so SparkEntry can
    * interpolate the SAME constants into a DuckDB oracle as literals
    * (Double.toString is shortest-round-trip, so the SQL parser
    * recovers bit-identical doubles and the projection folds match).
    */
  def planeValues(p: Int, dims: Int): Seq[Double] = {
    val rnd = new scala.util.Random(0xC0FFEE + p)
    Seq.fill(dims)(rnd.nextDouble() * 2.0 - 1.0)
  }

  /** Random-hyperplane LSH signature: bit p = sign(vec · plane_p),
    * packed into a long. For unit-ish vectors, P(bit differs) =
    * angle/π, so near-duplicate vectors share most bits. `dims` must
    * match the embedding dimensionality.
    */
  def lshSig(vec: Column, nPlanes: Int, dims: Int = 64): Column = {
    require(nPlanes <= 64)
    (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, plane(p, dims), (x, c) => x * c),
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
