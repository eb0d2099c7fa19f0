package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Mode of an `array<string>` column — the most frequent element and
  * its count, ties broken to the lexicographically (binary) smallest
  * element — as one native codegen'd pass.
  *
  * The composable form (`aggregate` over `array_sort`, tracking
  * (prev, run, best, gram)) is what e10 shipped first: higher-order
  * functions are interpreted per element and the fold allocates a
  * 4-field struct per step, which made the three per-doc folds the
  * whole cost of the query (~2.8 s at sf0.1 for ~0.8 M tiny shingles).
  * This expression sorts a scratch copy with the same binary ordering
  * `array_sort` uses (UTF8String.compareTo) and scans adjacent runs in
  * one tight loop: the longest run IS the mode, and traversal in sorted
  * order with a strictly-greater update gives the same
  * smallest-element tie-break as the fold's `run > best`.
  *
  * Returns `struct<best: bigint, gram: string>`; an empty (or all-null)
  * array yields (0, ""), matching the fold's initial accumulator. Null
  * elements are skipped defensively (the shingle builder never emits
  * them).
  */
case class MaxRun(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"max_run expects an array<string> input, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("best", LongType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def prettyName: String = "max_run"

  override def nullSafeEval(a: Any): Any =
    MaxRun.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MaxRun.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaxRun {

  /** One pass: copy non-null elements, binary-sort, scan runs.
    * Callable from generated code.
    */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val a = new Array[AnyRef](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { a(m) = arr.getUTF8String(i); m += 1 }
      i += 1
    }
    if (m == 0)
      return new GenericInternalRow(
        Array[Any](0L, UTF8String.fromString("")))
    // UTF8String.compareTo is the byte-wise ordering array_sort uses.
    java.util.Arrays.sort(a, 0, m)
    var prev = a(0).asInstanceOf[UTF8String]
    var run = 1L
    var best = 1L
    var bestGram = prev
    i = 1
    while (i < m) {
      val cur = a(i).asInstanceOf[UTF8String]
      if (cur.equals(prev)) run += 1
      else { run = 1L; prev = cur }
      if (run > best) { best = run; bestGram = prev }
      i += 1
    }
    new GenericInternalRow(Array[Any](best, bestGram))
  }

  /** Column-level entry point. */
  def apply(c: Column): Column =
    graftbridge.column(MaxRun(graftbridge.expression(c)))
}
