package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native aggregate: ELEMENT-WISE minimum of string arrays — the
  * signature-merge operation of MinHash clustering (the element-wise
  * min of member signatures IS the cluster's signature, Broder 1997),
  * which no Spark built-in expresses: per-position `min(element_at)`
  * works only for small FIXED widths, and collect_list+reduce
  * materializes every member array. This runs as a normal partial/
  * final hash aggregate — map-side combine, one buffer array per
  * group, any signature width.
  *
  * Null inputs are ignored (like built-in min); an empty group yields
  * null. Null ELEMENTS are skipped (a null contributes no information
  * at its position; a position that only ever saw nulls stays null).
  * Mixed lengths take the shorter prefix (defensive — signatures are
  * fixed-width by construction). Non-array input is an ANALYSIS error
  * (the function is SQL-exposed as array_min_agg).
  */
final case class ArrayMinAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[UTF8String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_min_agg requires an array<string> argument, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Array[UTF8String] = null

  private def minInto(buf: Array[UTF8String], arr: ArrayData): Array[UTF8String] = {
    if (buf == null) {
      val n = arr.numElements()
      val out = new Array[UTF8String](n)
      var i = 0
      while (i < n) {
        out(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).clone()
        i += 1
      }
      out
    } else {
      val n = math.min(buf.length, arr.numElements())
      val out = if (n == buf.length) buf else java.util.Arrays.copyOf(buf, n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val v = arr.getUTF8String(i)
          if (out(i) == null || v.compareTo(out(i)) < 0) out(i) = v.clone()
        }
        i += 1
      }
      out
    }
  }

  override def update(buf: Array[UTF8String], input: InternalRow): Array[UTF8String] = {
    val v = child.eval(input)
    if (v == null) buf else minInto(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: Array[UTF8String], other: Array[UTF8String]): Array[UTF8String] =
    if (other == null) buf
    else minInto(buf, new GenericArrayData(other.asInstanceOf[Array[AnyRef]]))

  override def eval(buf: Array[UTF8String]): Any =
    if (buf == null) null else new GenericArrayData(buf.asInstanceOf[Array[AnyRef]])

  override def serialize(buf: Array[UTF8String]): Array[Byte] = {
    if (buf == null) return Array.emptyByteArray
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { s =>
      if (s == null) out.writeInt(-1) // null element (skipped position)
      else { val b = s.getBytes; out.writeInt(b.length); out.write(b) }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[UTF8String] = {
    if (bytes.isEmpty) return null
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val out = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      if (len < 0) out(i) = null
      else {
        val b = new Array[Byte](len)
        in.readFully(b)
        out(i) = UTF8String.fromBytes(b)
      }
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): ArrayMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ArrayMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ArrayMinAgg =
    copy(child = c.head)
  override def prettyName: String = "array_min_agg"
}
