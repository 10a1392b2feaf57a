package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArrayMinAgg, BottomKDistinctLongs, BoundedCollectLongs, MinHashSigs, RollingFp, ShingleMd5s, TokenSimHash64, VectorDotQ}

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
    ext.injectFunction((
      FunctionIdentifier("shingle_md5s"),
      new ExpressionInfo(classOf[ShingleMd5s].getName, "shingle_md5s"),
      (exprs: Seq[Expression]) =>
        ShingleMd5s(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (exprs: Seq[Expression]) => MinHashSigs(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("rolling_fp"),
      new ExpressionInfo(classOf[RollingFp].getName, "rolling_fp"),
      (exprs: Seq[Expression]) => RollingFp(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("array_min_agg"),
      new ExpressionInfo(classOf[ArrayMinAgg].getName, "array_min_agg"),
      (exprs: Seq[Expression]) => ArrayMinAgg(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("bounded_collect_longs"),
      new ExpressionInfo(classOf[BoundedCollectLongs].getName, "bounded_collect_longs"),
      (exprs: Seq[Expression]) => BoundedCollectLongs(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("bottom_k_distinct"),
      new ExpressionInfo(classOf[BottomKDistinctLongs].getName, "bottom_k_distinct"),
      (exprs: Seq[Expression]) => BottomKDistinctLongs(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue())))
  }
}
