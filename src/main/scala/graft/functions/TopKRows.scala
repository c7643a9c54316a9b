package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Grouped top-k with an ARBITRARY row payload — the generalization of
  * [[TopKByValue]] that the `RewriteRankFilterToTopK` optimizer rule targets.
  *
  * Semantics: for each group, keep the `k` rows that rank first under
  * `order` (the window's ORDER BY, any datatypes / directions / null
  * ordering), and return their `payload` columns as `array<struct<...>>` in
  * rank order. `posexplode` recovers (rank-1, row).
  *
  * Versus the `row_number() over (...) <= k` window formulation: a
  * k-element bounded heap per group — O(n log k) instead of a full
  * per-group sort, map-side partial aggregation (each input partition
  * contributes at most k rows per group to the shuffle instead of every
  * row), and no single sort operator over the whole partition.
  *
  * Rows are stored as UnsafeRow copies of [sortKeys ++ payload]; ordering
  * is an InterpretedOrdering over the sort-key prefix (heap comparisons on
  * at-most-k elements are not a codegen hot path).
  */
case class TopKRows(
    order: Seq[SortOrder],
    payload: Seq[Expression],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, "k must be positive")

  private def numSort: Int = order.size

  /** The output element type: one struct field per payload expression. */
  def elementStruct: StructType = StructType(payload.zipWithIndex.map {
    case (p, i) =>
      val name = p match {
        case ne: NamedExpression => ne.name
        case _ => s"c$i"
      }
      StructField(name, p.dataType, p.nullable)
  })

  override def children: Seq[Expression] = order.map(_.child) ++ payload

  /** Projects an input row to the stored [sortKeys ++ payload] UnsafeRow. */
  @transient private lazy val storeProj: UnsafeProjection =
    UnsafeProjection.create(children.toArray)

  /** Extracts the payload struct fields from a stored row. */
  @transient private lazy val payloadProj: UnsafeProjection =
    UnsafeProjection.create(payload.zipWithIndex.map { case (p, i) =>
      BoundReference(numSort + i, p.dataType, p.nullable)
    }.toArray[Expression])

  /** Rank order over stored rows: compare(a,b) < 0 ⇔ a ranks before b.
    * PriorityQueue dequeues its MAX, i.e. the worst-ranked row — exactly
    * the eviction candidate. */
  @transient private lazy val rankOrdering: Ordering[InternalRow] =
    new InterpretedOrdering(order.zipWithIndex.map { case (so, i) =>
      SortOrder(BoundReference(i, so.child.dataType, so.child.nullable),
        so.direction, so.nullOrdering, Seq.empty)
    })

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty(rankOrdering)

  override def update(buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val stored = storeProj(input)
    if (buf.size < k) buf.enqueue(stored.copy())
    else if (rankOrdering.compare(stored, buf.head) < 0) {
      buf.dequeue()
      buf.enqueue(stored.copy())
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach { r =>
      if (buf.size < k) buf.enqueue(r)
      else if (rankOrdering.compare(r, buf.head) < 0) {
        buf.dequeue(); buf.enqueue(r)
      }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any = {
    // non-destructive: a second eval over the same buffer (window reuse /
    // retried tasks) must see the heap intact, so sort a snapshot instead
    // of draining the queue
    val bestToWorst = buf.toArray.sorted(rankOrdering)
    new GenericArrayData(
      bestToWorst.iterator.map(r => payloadProj(r).copy()).toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { r =>
      val b = r.asInstanceOf[UnsafeRow].getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(children.size)
      row.pointTo(b, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(elementStruct, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_rows"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(
      order = order.zip(newChildren.take(numSort)).map { case (so, c) =>
        so.copy(child = c)
      },
      payload = newChildren.drop(numSort))
}
