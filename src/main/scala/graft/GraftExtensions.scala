package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{FloatVecDot, MaxRun, Md5Hash64, Simhash64}

/** SparkSessionExtensions hook — registers the engine's custom
  * Catalyst expressions so pure-SQL users get them too:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or: spark.sql.extensions=graft.GraftExtensions
  *   spark.sql("SELECT float_vec_dot(a.embedding, b.embedding) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.floatVecDot)
    ext.injectFunction(GraftExtensions.md5Hash64)
    ext.injectFunction(GraftExtensions.maxRun)
    ext.injectFunction(GraftExtensions.simhash64)
  }
}

object GraftExtensions {

  /** (name, info, builder) triple for float_vec_dot. */
  val floatVecDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("float_vec_dot"),
    new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"float_vec_dot expects 2 arguments, got ${children.length}")
      FloatVecDot(children.head, children(1))
    })

  /** (name, info, builder) triple for md5_hash64. */
  val md5Hash64: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("md5_hash64"),
    new ExpressionInfo(classOf[Md5Hash64].getName, "md5_hash64"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"md5_hash64 expects 1 argument, got ${children.length}")
      Md5Hash64(children.head)
    })

  /** (name, info, builder) triple for max_run. */
  val maxRun: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("max_run"),
    new ExpressionInfo(classOf[MaxRun].getName, "max_run"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"max_run expects 1 argument, got ${children.length}")
      MaxRun(children.head)
    })

  /** (name, info, builder) triple for simhash_64. */
  val simhash64: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_64"),
    new ExpressionInfo(classOf[Simhash64].getName, "simhash_64"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        s"simhash_64 expects 1 argument, got ${children.length}")
      Simhash64(children.head)
    })
}
