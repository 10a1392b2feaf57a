package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native order-sensitive rolling-hash fingerprint:
  * `h → (h·31 + codePoint) mod (2^31−1)` left-folded over the string's
  * CHARACTERS — semantics exactly ≡ the Column formulation
  * `aggregate(transform(split(text,""), ascii), 0, pmod(h*31+c, M))`
  * and its DuckDB twin (list_reduce over ascii(substr(...))): both
  * engines' `ascii`/`substr` are code-point-based, so the fold runs
  * over Unicode code points, not UTF-16 chars. One tight JVM loop
  * instead of an interpreted per-character HOF fold (same motivation
  * as [[TokenSimHash64]]). */
final case class RollingFp(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_fp needs a string child, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val M = 2147483647L
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % M
      i += Character.charCount(cp)
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFp =
    copy(child = newChild)
  override def prettyName: String = "rolling_fp"
}
