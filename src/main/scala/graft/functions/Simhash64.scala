package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text's space-separated tokens as ONE native
  * per-row pass — bit-exact with the composable reference form
  * `TextFns.simhash64(TextFns.tokens(text))` (one md5 per token,
  * first-8-bytes-big-endian word hash, ±1 bit votes, majority pack)
  * and therefore with the c3/f6 DuckDB replays, which stay unchanged.
  *
  * Why a kernel: the composable form materializes the token-hash
  * array and then runs SIXTY-FOUR separate `aggregate` folds over it
  * (one per bit), each an interpreted higher-order lambda; c3 dodged
  * that with an explode + 64-sum groupBy — at the cost of shuffling
  * every (doc, token-hash) row. This kernel computes the signature
  * where the text already is: one md5 per token (hashed in place via
  * the slice digest — no per-token array copy), 64 counter updates
  * per token, no intermediate array, no explode, NO SHUFFLE. The
  * CharGrams/ShingleWindows move applied to signature computation.
  *
  * Tokenization contract (must match `split(text, " ", -1)` in both
  * engines): split on every single 0x20 byte, KEEPING empty tokens —
  * "a  b" → ["a", "", "b"], "a " → ["a", ""], "" → [""]. Space is
  * ASCII, so byte-level splitting is exact on UTF-8 input.
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_64 expects a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_64"

  override def nullSafeEval(s: Any): Any =
    Simhash64.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Simhash64.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash64 {

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val counts = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        val h = Md5Hash64.hashBytes(bytes, start, i - start)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Column-level entry point. */
  def apply(c: Column): Column =
    graftbridge.column(Simhash64(graftbridge.expression(c)))
}
