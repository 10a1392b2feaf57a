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

  /** Validated integer-literal argument for the parameterized
    * builders: a missing, non-foldable, null or non-positive arg must
    * read as a clear resolution-time message, not a raw
    * IndexOutOfBounds/NPE from `exprs(i).eval()`. */
  private def intLit(fn: String, exprs: Seq[Expression], i: Int,
      what: String, requirePositive: Boolean = true): Int = {
    require(exprs.length > i,
      s"$fn requires ${i + 1} arguments; $what (argument ${i + 1}) is missing")
    val e = exprs(i)
    require(e.foldable, s"$fn: $what must be an integer literal, got ${e.sql}")
    val v = e.eval()
    require(v != null, s"$fn: $what must not be null")
    val n = v.asInstanceOf[Number].intValue()
    require(!requirePositive || n > 0, s"$fn: $what must be positive, got $n")
    n
  }

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
        ShingleMd5s(exprs.head, intLit("shingle_md5s", exprs, 1, "the n-gram size"))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (exprs: Seq[Expression]) => MinHashSigs(exprs.head,
        intLit("minhash_sigs", exprs, 1, "the shingle size"),
        intLit("minhash_sigs", exprs, 2, "the hash count"))))
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
        intLit("bounded_collect_longs", exprs, 1, "the buffer limit"))))
    ext.injectFunction((
      FunctionIdentifier("bottom_k_distinct"),
      new ExpressionInfo(classOf[BottomKDistinctLongs].getName, "bottom_k_distinct"),
      (exprs: Seq[Expression]) => BottomKDistinctLongs(exprs.head,
        intLit("bottom_k_distinct", exprs, 1, "k"))))
  }
}
