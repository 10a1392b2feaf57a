package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{TokenSimHash64, VectorDotQ}

/** SparkSessionExtensions installer for graft's native expressions —
  * the supported library integration point: set
  * `spark.sql.extensions=graft.spark.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) and the functions are
  * available in EVERY session of the application, including pure-SQL
  * ones, with no per-session register() call. The per-session
  * [[graft.functions.GraftFunctions.register]] remains for ad-hoc use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[VectorDotQ].getName, "dot_q"),
      (exprs: Seq[Expression]) => VectorDotQ(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("token_simhash64"),
      new ExpressionInfo(classOf[TokenSimHash64].getName, "token_simhash64"),
      (exprs: Seq[Expression]) => TokenSimHash64(exprs.head)))
  }
}
