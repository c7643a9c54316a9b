package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions — so `spark.sql("... dot_long(a,
  * b)")` works anywhere the Scala `Column` API does — and its optimizer
  * rules.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or: spark.sql.extensions=graft.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // conf-gated (spark.graft.topkRewrite.enabled); see the rule's scaladoc
    e.injectOptimizerRule(_ => graft.plans.RewriteRankFilterToTopK)
    GraftFunctionRegistry.all.foreach { case (name, clazz, builder) =>
      e.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo(clazz, name), builder))
    }
  }
}

/** The engine's SQL-function surface, shared by the builder-time
  * (GraftExtensions) and live-session (GraftFunctions.register) paths.
  * Integer parameters arrive as SQL literals and are folded at
  * registration. */
object GraftFunctionRegistry {
  private def int(e: Expression): Int =
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"expected integer literal, got $other")
    }

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("dot_long", classOf[DotProductLong].getName,
      es => DotProductLong(es(0), es(1))),
    ("dot_float", classOf[DotProductFloat].getName,
      es => DotProductFloat(es(0), es(1))),
    ("quantize_vector", classOf[QuantizeVector].getName,
      es => QuantizeVector(es(0), es(1).eval(null).toString.toDouble)),
    ("simhash_bits", classOf[SimHashBits].getName,
      es => SimHashBits(es(0), int(es(1)))),
    ("md5_halves", classOf[Md5Halves].getName,
      es => Md5Halves(es(0))),
    ("winnow_fingerprints", classOf[WinnowFingerprints].getName,
      es => WinnowFingerprints(es(0), int(es(1)), int(es(2)))))
}

/** Runtime twin of GraftExtensions for sessions that already exist. */
object GraftFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graft.Bridge.registerTempFunction
    GraftFunctionRegistry.all.foreach { case (name, _, builder) =>
      registerTempFunction(spark, name, builder)
    }
  }
}
