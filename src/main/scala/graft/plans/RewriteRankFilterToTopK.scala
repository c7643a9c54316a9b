package graft.plans

import graft.functions.TopKRows
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}

/** Optimizer rule: `Filter(row_number <= k)` over a Window ⇒ bounded-heap
  * top-k aggregate.
  *
  *   Filter(rn <= k)                      Project(payload cols, pos+1 AS rn)
  *     Window(rn = row_number()      ⇒      Generate(posexplode(topk))
  *            over part/order)                Aggregate(part, top_k_rows(order, payload, k))
  *       child                                  child
  *
  * Spark's own InferWindowGroupLimit (3.5+) already prunes each group to k
  * rows before AND after the shuffle, but the surviving plan still sorts
  * [part ++ order] and runs the window operator. This rewrite replaces the
  * whole pipeline with hash aggregation: no sort at all, map-side combine,
  * and at most k rows per group per map partition in the shuffle — the
  * formulation that survives 100 TB groups.
  *
  * Guarded (off by default) by `spark.graft.topkRewrite.enabled`, because
  * the engine's registry intentionally benchmarks the window formulation
  * and the rewrite side by side. Output attribute ids are preserved, so
  * parent plans above the Filter are untouched.
  *
  * Row-tie semantics match `row_number`'s: when the window ORDER BY is not
  * a total order, which of the tied rows survive is engine-dependent in
  * both formulations.
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] with PredicateHelper {

  val CONF_KEY = "spark.graft.topkRewrite.enabled"

  /** Idempotently register on a live session (public experimental-methods
    * hook — no builder access needed). The builder path is
    * GraftExtensions.injectOptimizerRule. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  private def intBound(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case _ => None
  }

  /** `predicate` ⇒ "rn <= result" for the given rn attribute, if it has
    * that shape (through an optional cast inserted above the window). */
  private def limitOf(predicate: Expression, rn: Attribute): Option[Long] = {
    def isRn(x: Expression): Boolean = x match {
      case a: Attribute => a.exprId == rn.exprId
      case Cast(a: Attribute, _, _, _) => a.exprId == rn.exprId
      case _ => false
    }
    predicate match {
      case LessThanOrEqual(l, r) if isRn(l) => intBound(r)
      case LessThan(l, r) if isRn(l) => intBound(r).map(_ - 1)
      case GreaterThanOrEqual(l, r) if isRn(r) => intBound(l)
      case GreaterThan(l, r) if isRn(r) => intBound(l).map(_ - 1)
      case EqualTo(l, r) if isRn(l) => intBound(r).filter(_ == 1L)
      case EqualTo(l, r) if isRn(r) => intBound(l).filter(_ == 1L)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(CONF_KEY, "false").toBoolean) return plan
    plan.transformUp {
      case f @ Filter(cond, w @ Window(
          Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(_, _, SpecifiedWindowFrame(
              RowFrame, UnboundedPreceding, CurrentRow))), _)),
          partSpec, orderSpec, wchild, _))
          if orderSpec.nonEmpty &&
            partSpec.forall(_.isInstanceOf[AttributeReference]) &&
            orderSpec.forall(_.deterministic) =>
        val rn = alias.toAttribute
        val conjuncts = splitConjunctivePredicates(cond)
        val bounds = conjuncts.flatMap(limitOf(_, rn))
        val rest = conjuncts.filter(limitOf(_, rn).isEmpty)
        if (bounds.isEmpty || bounds.min <= 0 || bounds.min > 10000000 ||
          rest.exists(_.references.exists(_.exprId == rn.exprId))) f
        else {
          val k = bounds.min.toInt
          // InferWindowGroupLimit may already have inserted its per-group
          // pruning node below the window; the aggregate subsumes it.
          val child = wchild match {
            case wgl: WindowGroupLimit => wgl.child
            case c => c
          }
          val partAttrs = partSpec.map(_.asInstanceOf[AttributeReference])
          val payload = child.output
          val aggFn = TopKRows(orderSpec, payload, k)
          val topkAlias = Alias(aggFn.toAggregateExpression(), "__graft_topk")()
          val aggregate =
            Aggregate(partAttrs, partAttrs :+ topkAlias, child)
          val posAttr =
            AttributeReference("__graft_pos", IntegerType, nullable = false)()
          val rowAttr = AttributeReference(
            "__graft_row", aggFn.elementStruct, nullable = false)()
          val generate = Generate(
            PosExplode(topkAlias.toAttribute),
            unrequiredChildIndex = Seq(partAttrs.size),
            outer = false,
            qualifier = None,
            generatorOutput = Seq(posAttr, rowAttr),
            aggregate)
          // Rebuild the window's output under the ORIGINAL exprIds: grouping
          // attrs pass through unchanged; the rest come out of the struct.
          val byExprId = partAttrs.map(_.exprId).toSet
          val restored = child.output.zipWithIndex.map { case (a, i) =>
            if (byExprId.contains(a.exprId)) a
            else Alias(GetStructField(rowAttr, i, Some(a.name)), a.name)(
              exprId = a.exprId, qualifier = a.qualifier)
          }
          val rnRestored = Alias(Add(posAttr, Literal(1)), alias.name)(
            exprId = alias.exprId, qualifier = alias.qualifier)
          val project = Project(restored :+ rnRestored, generate)
          if (rest.isEmpty) project else Filter(rest.reduce(And), project)
        }
    }
  }
}
