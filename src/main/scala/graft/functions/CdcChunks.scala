package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MAP-SIDE content-defined chunker: splits a document's text
  * into CDC chunks in one per-row pass and returns
  * `array<struct<chunk_fp:string, n_tokens:bigint>>` — one element per
  * chunk INSTANCE, in document order (duplicate chunks within a doc
  * stay distinct elements, exactly the multiset the old per-(doc,
  * chunk) aggregation produced).
  *
  * Semantics are byte-identical to the Column formulation this
  * replaces (and to the DuckDB twin in
  * [[graft.spark.Oracles]] `dedup_cdc_chunks`):
  *  - tokens = split on single space, empties KEPT (`split(text," ",-1)`);
  *  - a token whose 32-bit hash (first 8 lowercase-hex md5 nibbles,
  *    read base-16) ≡ 0 mod `divisor` ENDS the current chunk — the
  *    boundary token is its chunk's LAST token (the exclusive
  *    running-sum convention);
  *  - chunk_fp = lowercase-hex md5 of the chunk's tokens joined by a
  *    single space; n_tokens = token count including the boundary;
  *  - the tail after the last boundary is a final chunk (empty text
  *    still yields one single-empty-token chunk, because split keeps
  *    the one empty field).
  *
  * This is the 100-TB plan shape the old posexplode + per-doc-Window
  * pipeline was not: the token stream never leaves the map side — no
  * Exchange, no sort, no Window state — and the only shuffle left in
  * [[graft.operators.Dedup.cdcChunkDuplicates]] is the inherent
  * chunk-fp aggregation. Chunking is local to each row, so the
  * operator parallelizes per document exactly like [[ShingleMd5s]].
  */
final case class CdcChunks(child: Expression, divisor: Int)
    extends UnaryExpression with CodegenFallback {

  require(divisor >= 1, s"cdc_chunks divisor must be >= 1, got $divisor")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("chunk_fp", StringType, nullable = false),
      StructField("n_tokens", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks needs a string child, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val sb = new java.lang.StringBuilder
    var nTok = 0L

    def emit(): Unit = {
      md.reset()
      val hex = MinHashSigs.hex(
        md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      val row: InternalRow =
        new GenericInternalRow(Array[Any](UTF8String.fromBytes(hex), nTok))
      out += row
      sb.setLength(0)
      nTok = 0L
    }

    var i = 0
    while (i < toks.length) {
      if (nTok > 0L) sb.append(' ')
      sb.append(toks(i))
      nTok += 1L
      // 32-bit token hash = first 4 md5 bytes big-endian (≡ parsing the
      // first 8 hex nibbles base-16, the cross-engine-exact convention)
      md.reset()
      val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      if (h % divisor == 0L) emit()
      i += 1
    }
    if (nTok > 0L) emit()
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
  override def prettyName: String = "cdc_chunks"
}
