package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise SUM of long-array columns — the centroid/histogram
  * aggregate.
  *
  * The composable alternative is one `sum(element_at(v, i))` PER DIMENSION:
  * d separate aggregate expressions, each walking the array per row (d²
  * element reads per row interpreted, d aggregate buffers boxed
  * individually). This aggregate keeps ONE primitive long[] per group and
  * adds each input array in a single pass — O(d) per row, map-side partial
  * aggregation (the shuffle carries one d-length array per group per
  * partition), associative merge.
  *
  * Null arrays are ignored; null ELEMENTS count as 0; the group's vector
  * length is fixed by its first non-null input (mismatched lengths raise —
  * silently truncating a ragged dimension would corrupt every centroid).
  * Empty groups return an empty array. */
case class VectorSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be array<bigint>, got $other")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return buf
    val n = arr.numElements()
    val acc = if (buf.length == 0) new Array[Long](n) else buf
    require(acc.length == n,
      s"vector_sum_long: ragged input (${acc.length} vs $n elements)")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) acc(i) += arr.getLong(i)
      i += 1
    }
    acc
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) return buf
    if (buf.length == 0) return other
    require(buf.length == other.length,
      s"vector_sum_long: ragged partials (${buf.length} vs ${other.length})")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vector_sum_long"

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumLong =
    copy(child = newChildren.head)
}

object VectorSum {
  import org.apache.spark.sql.graft.Bridge

  /** `df.groupBy(g).agg(vectorSumLong(col(v)))` — element-wise long-array
    * sum per group. */
  def vectorSumLong(v: Column): Column =
    Bridge.column(VectorSumLong(Bridge.expression(v)).toAggregateExpression())
}
