package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Z-order (Morton) interleave of two 16-bit-normalized keys — the
  * multi-dimensional clustering key for data-skipping layouts: sorting by
  * z co-locates rows that are close in BOTH dimensions, so per-file
  * min/max statistics become selective for predicates on EITHER column
  * (a single-column sort gives locality on that column only).
  *
  * Inputs are longs already normalized to [0, 65535] (the caller scales
  * real key ranges down — 16 bits per dimension is plenty for file-level
  * skipping; finer z-resolution than the file count is wasted). Output is
  * the 32-bit interleave as a long. Codegen'd: two table-free bit-spread
  * sequences, no branches.
  */
case class ZOrderLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"z_order_long needs (bigint, bigint), got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "z_order_long"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderLong.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderLong.interleave($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZOrderLong = copy(left = newLeft, right = newRight)
}

object ZOrderLong {
  /** Spread the low 16 bits of x to even bit positions (classic
    * magic-number sequence). */
  def spread16(x0: Long): Long = {
    var x = x0 & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** z = a-bits at odd positions, b-bits at even positions. */
  def interleave(a: Long, b: Long): Long =
    (spread16(a) << 1) | spread16(b)

  def zOrder(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(ZOrderLong(
      org.apache.spark.sql.graft.Bridge.expression(a),
      org.apache.spark.sql.graft.Bridge.expression(b)))
}
