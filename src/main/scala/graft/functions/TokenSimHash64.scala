package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash of a whitespace-tokenized string → struct
  * (lo, hi) of two 32-bit halves (lo from md5 nibbles 1-8 = digest
  * bytes 0-3, hi from nibbles 9-16 = bytes 4-7; each token's bits vote
  * ±1 per position, sketch bit = majority).
  *
  * Semantics are EXACTLY the Column/HOF formulation and its DuckDB
  * twin (Oracles.simhash64Cte): tokenization ≡ `split(text, " ")`
  * with trailing empties kept, md5 over UTF-8 token bytes. The native
  * eval exists because higher-order functions run on the interpreted
  * CodegenFallback path with no common-subexpression elimination —
  * the fold dominated dedup_simhash64 (measured ~18 s at sf0.1); one
  * tight JVM loop with a thread-local MessageDigest is ~100× cheaper
  * per document. (Same motivation as [[VectorDotQ]].)
  */
final case class TokenSimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    StructType(Seq(StructField("lo", LongType, nullable = false),
      StructField("hi", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"token_simhash64 needs a string child, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val votes = new Array[Int](64)
    val md = TokenSimHash64.digest.get()
    // split(" ", -1) ≡ Spark's split(text, " "): empties kept
    val toks = text.split(" ", -1)
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // lo = digest bytes 0-3 big-endian (hex nibbles 1-8), hi = bytes 4-7
      val vlo = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val vhi = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var b = 0
      while (b < 32) {
        votes(b) += (if (((vlo >> b) & 1L) == 1L) 1 else -1)
        votes(32 + b) += (if (((vhi >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      t += 1
    }
    var lo = 0L; var hi = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) lo |= 1L << b
      if (votes(32 + b) > 0) hi |= 1L << b
      b += 1
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    row.setLong(0, lo); row.setLong(1, hi)
    row
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSimHash64 =
    copy(child = newChild)
  override def prettyName: String = "token_simhash64"
}

object TokenSimHash64 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
