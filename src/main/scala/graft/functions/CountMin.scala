package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch over a string column — the classic sub-linear
  * frequency summary for heavy-hitter queries at 100 TB: the buffer is a
  * fixed `depth × width` long matrix regardless of cardinality, partials
  * merge by element-wise addition (map-side combine applies), and a point
  * estimate for any item is min over rows of its bucket count
  * (overestimates only, by collision).
  *
  * Hashing is md5-derived (`h_d(x) = md5("d|x").h1 mod width`) rather than
  * Murmur3: deterministic IN ANY ENGINE, so the whole sketch — not just
  * its estimates — is reproducible and differentially testable against a
  * SQL GROUP BY formulation (see the `e5_cms_sketch` oracle).
  *
  * Output: the sketch flattened row-major as array<long>
  * (`[depth][width]`), length depth·width. Null inputs are skipped. */
case class CountMinLong(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, "depth must be in [1, 16]")
  require(width >= 2, "width must be >= 2")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got $other")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  /** "d|" prefixes as bytes, computed once — the per-row hot path feeds
    * them straight into the digest instead of allocating a concatenated
    * UTF8String per row per depth. */
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(depth)(d => s"$d|".getBytes("UTF-8"))

  /** Row-d bucket of an item: the 60-bit h1 half of md5("d|item") mod
    * width — matches the SQL formulation
    * CAST('0x' || substr(md5(d || '|' || item), 1, 15) AS BIGINT) % width. */
  private def bucket(d: Int, itemBytes: Array[Byte]): Int = {
    val digest = TextExpressions.md5DigestPrefixed(prefixes(d), itemBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    ((h >>> 4) % width).toInt
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val itemBytes = v.asInstanceOf[UTF8String].getBytes
      var d = 0
      while (d < depth) {
        buf(d * width + bucket(d, itemBytes)) += 1
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](depth * width)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_long"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinLong =
    copy(child = newChildren.head)
}

object CountMin {
  import org.apache.spark.sql.graft.Bridge

  /** `df.agg(countMinLong(col(s), 4, 64))` — Count-Min sketch as a
    * depth×width flattened array<long>. */
  def countMinLong(s: Column, depth: Int, width: Int): Column =
    Bridge.column(
      CountMinLong(Bridge.expression(s), depth, width).toAggregateExpression())

  /** Point estimate from a flattened sketch: min over depths of the
    * item's bucket count. Pure column math over the sketch array. */
  def estimate(sketch: Column, item: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    val ests = (0 until depth).map { d =>
      val h1 = TextExpressions
        .md5Halves(concat(lit(s"$d|"), item)).getField("h1")
      element_at(sketch, (lit(d * width) + (h1 % width)).cast("int") + 1)
    }
    least(ests: _*)
  }
}
