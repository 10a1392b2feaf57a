package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: word `shingleN`-grams of a whitespace-
  * tokenized string → `numHashes` minhash values, each the MINIMUM of
  * `md5("k:" + md5hex(gram))` over all grams — computed in ONE tight
  * map-side pass per document, so the signature needs NO explode and
  * NO aggregation shuffle at all.
  *
  * Semantics are EXACTLY the relational formulation the DuckDB twins
  * use (explode(TF.shingles) → groupBy(doc).agg(min(md5(k:sh)))):
  * tokenization ≡ `split(text, " ")` with empties kept, gram text
  * joined by one space, inner md5 rendered as lowercase hex BEFORE the
  * outer keyed hash, min = lexicographic over hex ≡ unsigned byte-wise
  * over digests. Returns NULL when the doc has fewer than `shingleN`
  * tokens (the exploded formulation produced no row for such docs).
  *
  * Motivation ≡ [[TokenSimHash64]]/[[VectorDotQ]]: the relational form
  * is correct but pays an explode of ~|tokens| rows per doc plus a
  * hash-agg exchange; at 10^12 docs that shuffle is pure cost since
  * the signature is a per-row pure function.
  */
final case class MinHashSigs(child: Expression, shingleN: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs needs a string child, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = text.split(" ", -1) // ≡ Spark split(text, " ")
    val nGrams = toks.length - (shingleN - 1)
    if (nGrams <= 0) return null
    val md = MinHashSigs.digest.get()
    val mins = new Array[Array[Byte]](numHashes)
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
      val inner = MinHashSigs.hex(
        md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      var k = 0
      while (k < numHashes) {
        md.reset()
        md.update(MinHashSigs.keyPrefix(k))
        val d = md.digest(inner)
        if (mins(k) == null || MinHashSigs.unsignedLt(d, mins(k))) mins(k) = d
        k += 1
      }
      i += 1
    }
    new GenericArrayData(
      mins.map(d => UTF8String.fromString(new String(MinHashSigs.hex(d),
        java.nio.charset.StandardCharsets.US_ASCII))).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
  override def prettyName: String = "minhash_sigs"
}

object MinHashSigs {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Lowercase hex of a digest, as ASCII bytes (md5's hex rendering). */
  private[functions] def hex(d: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = HexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    out
  }

  /** `"$k:"` as UTF-8 bytes, cached for the hash-key prefix. */
  private val prefixes =
    scala.collection.concurrent.TrieMap.empty[Int, Array[Byte]]
  private[functions] def keyPrefix(k: Int): Array[Byte] =
    prefixes.getOrElseUpdate(k, s"$k:".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Unsigned byte-wise less-than ≡ lexicographic order of the hex
    * rendering (hex is monotonic in the unsigned byte value). */
  private[functions] def unsignedLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    a.length < b.length
  }
}
