package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Grouped top-k as a bounded-heap aggregate.
  *
  * The standard formulation — `row_number() over (partition by g order by v
  * desc) <= k` — SORTS every group in full: O(n log n) per group and the
  * whole input flows through the window operator's buffer. This aggregate
  * keeps a k-element min-heap per group instead: O(n log k), the shuffle
  * after partial aggregation carries at most k entries per group, and
  * map-side combine applies (the window version shuffles everything).
  *
  * Returns the payloads of the top `k` rows by (value DESC, payload ASC) —
  * the payload tiebreak makes results deterministic — as an array in rank
  * order. Pair with `posexplode` to recover (payload, rank) rows.
  */
case class TopKByValue(
    value: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // dequeue must yield the WORST element (lowest value; ties: highest
  // payload) so the heap evicts correctly when it exceeds k.
  private val worstFirst: Ordering[(Double, Long)] = (a, b) =>
    if (a._1 != b._1) java.lang.Double.compare(b._1, a._1)
    else java.lang.Long.compare(a._2, b._2)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = value.eval(input)
    val p = payload.eval(input)
    if (v != null && p != null) {
      buf.enqueue((v.asInstanceOf[Double], p.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { e => buf.enqueue(e); if (buf.size > k) buf.dequeue() }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val worstToBest: Seq[(Double, Long)] = buf.dequeueAll
    new GenericArrayData(worstToBest.reverse.map(_._2).toArray)
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (v, p) => out.writeDouble(v); out.writeLong(p) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(value, payload)
  override def prettyName: String = "top_k_by_value"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByValue =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByValue =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByValue =
    copy(value = newChildren(0), payload = newChildren(1))
}

object TopKAggregate {
  import org.apache.spark.sql.graft.Bridge

  /** Top-k payloads per group by value desc (payload asc tiebreak), in rank
    * order: `df.groupBy(g).agg(topKByValue(col(v), col(p), 3))`. */
  def topKByValue(value: Column, payload: Column, k: Int): Column =
    Bridge.column(
      TopKByValue(Bridge.expression(value.cast("double")),
        Bridge.expression(payload.cast("long")), k)
        .toAggregateExpression())
}
