package graft

import graft.functions.{DotProductFloat, DotProductLong}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql("... dot_long(a,b)")`
  * works anywhere the Scala `Column` API does.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or: spark.sql.extensions=graft.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // conf-gated (spark.graft.topkRewrite.enabled); see the rule's scaladoc
    e.injectOptimizerRule(_ => graft.plans.RewriteRankFilterToTopK)
    e.injectFunction((
      FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotProductLong].getName, "dot_long"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductLong(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_float"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "dot_float"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductFloat(exprs(0), exprs(1))))
  }
}

/** Runtime twin of GraftExtensions for sessions that already exist. */
object GraftFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.graft.Bridge.registerTempFunction
    registerTempFunction(spark, "dot_long", es => DotProductLong(es(0), es(1)))
    registerTempFunction(spark, "dot_float", es => DotProductFloat(es(0), es(1)))
  }
}
