package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native aggregate: ELEMENT-WISE sum of bigint arrays — the centroid/
  * codeword mean-numerator of the deterministic Lloyd rounds
  * ([[graft.operators.Similarity]]): `floor(sum_d / count)` per
  * dimension needs the per-dimension sums, which built-ins can only
  * express by EXPLODING every member vector into (group, dim, x) rows
  * and paying a second aggregation to reassemble the array
  * (`groupBy(g, d).agg(sum)` then `groupBy(g).agg(sort+collect_list)`
  * — two exchanges per training round). This computes the whole sum
  * vector as one normal partial/final hash aggregate: map-side
  * combine, one long[] buffer per group, one exchange, no explode and
  * no reassembly sort.
  *
  * Null inputs are ignored (like built-in sum); an empty group yields
  * null. Null ELEMENTS contribute 0 at their position. Mixed lengths
  * take the shorter prefix (defensive — vectors are fixed-width by
  * construction, enforced upstream by the subspace splitter). Overflow
  * wraps like built-in bigint sum; callers owning wider sums cast to
  * decimal before aggregating, exactly as with built-in `sum`.
  */
final case class ArrayLongSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_long_sum_agg requires an array<bigint> argument, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Array[Long] = null

  private def addInto(buf: Array[Long], arr: ArrayData): Array[Long] = {
    if (buf == null) {
      val n = arr.numElements()
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        out(i) = if (arr.isNullAt(i)) 0L else arr.getLong(i)
        i += 1
      }
      out
    } else {
      val n = math.min(buf.length, arr.numElements())
      val out = if (n == buf.length) buf else java.util.Arrays.copyOf(buf, n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) out(i) += arr.getLong(i)
        i += 1
      }
      out
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf else addInto(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other == null) buf
    else addInto(buf, new GenericArrayData(other))

  override def eval(buf: Array[Long]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    if (buf == null) return Array.emptyByteArray
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    if (bytes.isEmpty) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): ArrayLongSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ArrayLongSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ArrayLongSumAgg =
    copy(child = c.head)
  override def prettyName: String = "array_long_sum_agg"
}
