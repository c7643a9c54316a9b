package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** float[] → long[] quantization in one codegen'd pass:
  * out(i) = round(x(i) * scale) with Spark's `round` semantics (decimal
  * HALF_UP — away from zero, on the decimal rendering of the double), so it
  * is bit-for-bit the same as `transform(v, x -> round(x*scale) as long)`
  * while skipping the interpreted lambda machinery and the intermediate
  * boxed array.
  */
case class QuantizeVector(child: Expression, scale: Double)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_vector"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = QuantizeVector.roundHalfUp(arr.getFloat(i).toDouble * scale)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $c.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = graft.functions.QuantizeVector.roundHalfUp(
         |    ((double) $c.getFloat($i)) * $scale);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeVector =
    copy(child = newChild)
}

object QuantizeVector {
  /** Spark's Round(double, 0) semantics: decimal HALF_UP on the shortest
    * decimal rendering of the double (NOT Math.round / floor(x+0.5), which
    * differ on negative halves and on doubles just below .5 boundaries). */
  def roundHalfUp(d: Double): Long =
    if (d.isNaN) 0L // matches NaN-double → long cast
    else if (d >= Long.MaxValue.toDouble) Long.MaxValue // saturate like cast
    else if (d <= Long.MinValue.toDouble) Long.MinValue
    else java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  import org.apache.spark.sql.graft.Bridge

  def quantize(v: Column, scale: Double): Column =
    Bridge.column(QuantizeVector(Bridge.expression(v), scale))
}
