package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.FloatVecDot

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
}
