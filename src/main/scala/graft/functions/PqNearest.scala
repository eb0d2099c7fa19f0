package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** One product-quantization sub-centroid: id, vector, precomputed
  * squared norm, and the vector pre-wrapped as Catalyst ArrayData so
  * the winner can be emitted without a per-row allocation.
  */
final class PqCent(val centId: Long, val ce: Array[Float], val cn: Double)
    extends Serializable {
  val ceData: ArrayData = new GenericArrayData(ce)
}

/** A trained PQ codebook: `entries(j)` holds subspace j's sub-centroids
  * sorted ascending by centId (the argmin tie-break order). Cardinality
  * is FIXED at build time (≤ ks entries per subspace, ks ≤ 256 for the
  * byte-code layout) and independent of corpus size — the whole book is
  * a few hundred KB, shipped to executors as a codegen reference
  * object, never a join side.
  */
final class PqCodebook(val entries: Array[Array[PqCent]]) extends Serializable {
  require(entries.nonEmpty && entries.forall(_.nonEmpty),
    "PQ codebook must have at least one centroid per subspace")

  def m: Int = entries.length
  def ks: Int = entries.map(_.length).max

  /** Argmin squared distance of `sub` to subspace `subJ`'s centroids,
    * with the SAME arithmetic as the DataFrame/oracle form: dot is a
    * left-to-right float→double fold (FloatVecDot's loop), dist =
    * sn + cn − 2·dot with that exact parenthesization, ties broken by
    * ascending centId (strict `<` over the id-sorted entries). Returns
    * (cent_id, dist, dotj, cn, ce).
    */
  def nearest(subJ: Int, sub: ArrayData, sn: Double): InternalRow = {
    val cents = entries(subJ)
    var best: PqCent = null
    var bestDist = Double.MaxValue
    var bestDot = 0.0
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      val ce = c.ce
      val n = math.min(sub.numElements(), ce.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += sub.getFloat(i).toDouble * ce(i).toDouble
        i += 1
      }
      val dist = sn + c.cn - 2.0d * dot
      if (best == null || dist < bestDist) {
        best = c; bestDist = dist; bestDot = dot
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](
      best.centId, bestDist, bestDot, best.cn, best.ceData))
  }
}

/** Per-row PQ assignment: scores every sub-centroid of the row's
  * subspace inside the row and returns the argmin — the shape that
  * replaces the old N×m×ks candidate join + two-pass groupBy argmin
  * with ZERO shuffle (the codebook is a bounded reference object, the
  * scan stays one whole-stage-codegen pass; doGenCode emits a single
  * call into the compiled JVM loop above).
  *
  * Inputs: (sub_j int, sub array<float>, sn double) where sn =
  * FloatVecDot(sub, sub). Output struct: (cent_id, dist, dotj, cn, ce).
  */
case class PqNearestCentroid(first: Expression, second: Expression,
                             third: Expression, codebook: PqCodebook)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (IntegerType, ArrayType(FloatType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"pq_nearest_centroid expects (int, array<float>, double), got " +
          s"${a.simpleString}, ${b.simpleString}, ${c.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("cent_id", LongType, nullable = false),
    StructField("dist", DoubleType, nullable = false),
    StructField("dotj", DoubleType, nullable = false),
    StructField("cn", DoubleType, nullable = false),
    StructField("ce", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  override def prettyName: String = "pq_nearest_centroid"

  override def nullSafeEval(j: Any, sub: Any, sn: Any): Any =
    codebook.nearest(j.asInstanceOf[Int], sub.asInstanceOf[ArrayData],
      sn.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook,
      classOf[PqCodebook].getName)
    nullSafeCodeGen(ctx, ev, (j, sub, sn) =>
      s"${ev.value} = $cb.nearest($j, $sub, $sn);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqNearestCentroid {
  /** Column-level entry point. */
  def apply(codebook: PqCodebook)(subJ: Column, sub: Column,
                                  sn: Column): Column =
    graftbridge.column(PqNearestCentroid(
      graftbridge.expression(subJ), graftbridge.expression(sub),
      graftbridge.expression(sn), codebook))
}
