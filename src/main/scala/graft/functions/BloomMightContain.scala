package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bf.mightContainLong(key)` as a codegen'd predicate over a plan-embedded
  * Bloom filter — the shuffle-reduction workhorse for big⋈small joins at
  * scale: build the filter from the small side's keys, pre-filter the big
  * side BEFORE its shuffle, then run the exact join on survivors. False
  * positives only make the pre-filter less effective, never the join
  * wrong, so the end-to-end result stays exact (and oracle-checkable).
  *
  * The filter ships via `ctx.addReferenceObj` (one virtual call per row
  * inside whole-stage codegen, same pattern as the CountMin/WindowEnergy
  * expressions); at a few MB for ~1M keys it travels with the serialized
  * plan like any broadcast scalar.
  */
case class BloomMightContain(child: Expression, bf: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs bigint key, got $other")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bf.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bf, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def mightContain(key: Column, bf: BloomFilter): Column =
    org.apache.spark.sql.graft.Bridge.column(BloomMightContain(
      org.apache.spark.sql.graft.Bridge.expression(key), bf))
}
