package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native aggregate: the k MINIMUM DISTINCT values of a BIGINT column,
  * ascending — a KMV (k-minimum-values) cardinality sketch
  * (Bar-Yossef et al., RANDOM 2002; Beyer et al., SIGMOD 2007) when
  * fed uniform hashes: with m = number of distinct hashes seen,
  *
  *   m < k  → the buffer IS the distinct set (exact count = size);
  *   m ≥ k → D ≈ (k-1) · H / h_(k), with h_(k) the k-th smallest
  *            hash and H the hash-space size.
  *
  * The operator large-scale cardinality needs: O(k) memory per group
  * in every buffer, map-side partial aggregation, and a MERGEABLE
  * sketch (merge = set-union, keep k smallest — exactly what a
  * multi-level aggregation tree or a cross-day sketch union performs).
  * `approx_count_distinct` (HLL) covers the built-in path; KMV's
  * bottom-k array is additionally an engine-portable, integer-exact
  * object — a SQL oracle can recompute the identical k values and
  * estimate, which no HLL register bank allows. Nulls skipped; empty
  * group → empty array.
  */
final case class BottomKDistinctLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, "bottom_k_distinct k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bottom_k_distinct requires a bigint argument, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // skip values that cannot enter the bottom-k (no churn on hot path)
    if (buf.size < k || v < buf.last()) {
      buf.add(v)
      if (buf.size > k) buf.pollLast()
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    out.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.putLong(it.next().longValue())
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKDistinctLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKDistinctLongs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BottomKDistinctLongs =
    copy(child = c.head)
  override def prettyName: String = "bottom_k_distinct"
}
