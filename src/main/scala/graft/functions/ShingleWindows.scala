package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined sliding windows of `n` consecutive tokens over an
  * `array<string>` column — the n-gram/shingle kernel under
  * `TextFns.shingles`, as one native codegen'd pass.
  *
  * The composable form (`transform(sequence(1, count), i =>
  * concat_ws(" ", slice(toks, i, n)))`) is semantically identical but
  * interpreted: `transform` is a higher-order lambda evaluated per
  * window, and each window `slice` allocates an n-element array before
  * `concat_ws` walks it. Shingling is the innermost loop of every
  * text/dedup operator (c2 MinHash, c4 Jaccard, e6/e7 n-gram stats,
  * e10 top-gram, p2 decontamination), so the interpreted chain was the
  * dominant cost of the whole e/c family — e10 alone builds three of
  * them per doc. This expression emits the windows in one loop with no
  * per-window slice.
  *
  * Exact semantics match (property-tested against the JVM sliding
  * model and unchanged under every oracle): a doc with fewer than `n`
  * tokens yields an EMPTY array (not phantom short windows); empty
  * tokens are kept (consecutive separators, as concat_ws does); null
  * tokens are skipped within their window (concat_ws behavior — the
  * tokenizer never emits them).
  */
case class ShingleWindows(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_windows expects an array<string> input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingle_windows"

  override def nullSafeEval(a: Any): Any =
    ShingleWindows.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleWindows.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleWindows {

  private val SPACE = UTF8String.fromString(" ")
  private val EMPTY = new GenericArrayData(Array.empty[Any])

  /** All `len - n + 1` windows, one pass. Callable from generated
    * code. The scratch window buffer is reused across windows;
    * `UTF8String.concatWs` copies the bytes out, so reuse is safe.
    */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val count = len - (n - 1)
    if (count < 1) return EMPTY
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val window = new Array[UTF8String](n)
    val out = new Array[Any](count)
    i = 0
    while (i < count) {
      var j = 0
      while (j < n) { window(j) = toks(i + j); j += 1 }
      // concatWs skips nulls and keeps empties — concat_ws semantics
      out(i) = UTF8String.concatWs(SPACE, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
