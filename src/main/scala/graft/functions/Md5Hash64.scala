package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit md5-derived hash of a string column: the digest's FIRST 8
  * BYTES as a big-endian long — numerically identical to parsing the
  * first 16 hex chars as two 32-bit halves (the DuckDB-replayable
  * contract TextFns.md5hash64 documents), but computed with ONE digest
  * call and zero hex-string round-trips.
  *
  * Why an expression and not composed columns: the composed form
  * `shiftleft(conv(substring(md5(c),1,8),16,10),32) | conv(...)`
  * duplicates the md5 subtree, and inside higher-order-function
  * lambdas (c2's shingle transform, simhash64's token transform) the
  * interpreter has no common-subexpression elimination — every shingle
  * paid TWO digests plus hex formatting and parsing. Measured on c2 at
  * sf0.1 the composed form was ~1.7x the xxhash64 baseline; this
  * expression brings the md5 family back near it.
  */
case class Md5Hash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_hash64 expects a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_hash64"

  override def nullSafeEval(s: Any): Any =
    Md5Hash64.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Md5Hash64.hash($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash64 {
  // MessageDigest is not thread-safe; one instance per executor thread,
  // reset per call (allocation-free steady state)
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 8 digest bytes, big-endian — callable from generated code. */
  def hash(s: UTF8String): Long = hashBytes(s.getBytes)

  /** Same contract over raw bytes — the multimodal stubs' payload
    * checksum (a payload that IS a UTF-8 string hashes identically to
    * the string, which is what lets a DuckDB oracle replay it as
    * md5(text)).
    */
  def hashBytes(bytes: Array[Byte]): Long =
    hashBytes(bytes, 0, bytes.length)

  /** Slice form — lets a tokenizing kernel hash sub-ranges without
    * per-token array copies (the Simhash64 hot loop).
    */
  def hashBytes(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
      ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
  }

  /** Column-level entry point. */
  def apply(c: Column): Column =
    graftbridge.column(Md5Hash64(graftbridge.expression(c)))
}
