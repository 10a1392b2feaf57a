package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingles as md5-hex strings — semantics exactly
  * ≡ the Column formulation `transform(sequence(...), i =>
  * md5(array_join(slice(split(text," "), i+1, n), " ")))` and its
  * DuckDB twin: tokens = split on single space with empties kept, gram
  * joined by one space, lowercase hex md5, EMPTY array (not null) when
  * the doc has fewer than n tokens. One tight per-row pass instead of
  * an interpreted higher-order transform (HOFs are CodegenFallback —
  * see [[TokenSimHash64]]). */
final case class ShingleMd5s(child: Expression, shingleN: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"shingle_md5s needs a string child, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val nGrams = toks.length - (shingleN - 1)
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](nGrams)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < shingleN) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val hex = MinHashSigs.hex(
        md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      out(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleMd5s =
    copy(child = newChild)
  override def prettyName: String = "shingle_md5s"
}
