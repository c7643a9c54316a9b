package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen expressions over binary media payloads (see MultimodalOps for
  * the surrounding plumbing and the stubbed-codec rationale). */
object MultimodalExpressions {
  import org.apache.spark.sql.graft.Bridge

  /** Per-window byte-sum "energy" of a binary payload (see WindowEnergy). */
  def windowEnergy(payload: Column, win: Int): Column =
    Bridge.column(WindowEnergy(Bridge.expression(payload), win))
}

/** Per-window energy of a binary payload: the payload is treated as
  * consecutive `win`-byte windows (PCM-style audio framing; the final
  * partial window is kept) and each window's unsigned-byte sum is emitted —
  * `array<long>` indexed by window. The feature-extraction stand-in for a
  * real audio pipeline (RMS/spectral features slot into the same loop);
  * one tight JVM pass per row invoked from whole-stage codegen, no
  * interpreted lambda frames, no intermediate arrays. Empty payloads yield
  * an empty array. */
case class WindowEnergy(child: Expression, win: Int) extends UnaryExpression {
  require(win >= 1, "window must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be binary, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_energy"

  def compute(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long]((n + win - 1) / win)
    var i = 0
    while (i < n) {
      out(i / win) += bytes(i) & 0xffL
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("windowEnergy", this, classOf[WindowEnergy].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WindowEnergy =
    copy(child = newChild)
}
