package graft.plans

import graft.catalog.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{
  DataSourceV2Relation, DataSourceV2ScanRelation}

/** Optimizer rule: a catalog read of a [[graft.catalog.GraftTable]]
  * (resolved by Spark's own `CatalogManager` through
  * `graft.catalog.GraftCatalog`) becomes the engine's
  * [[GraftLogRelation]] leaf — so `SELECT … FROM graft.ns.t` gets
  * manifest-level file pruning, metadata-only aggregates, dynamic
  * join pruning, and MOR/schema-op resolution IDENTICALLY to
  * `TableLog.scan`, instead of the V1 fallback's full-snapshot read.
  *
  * Shape notes:
  *   - By the user-rule batch, `V2ScanRelationPushDown` has already
  *     turned the analysis-time `DataSourceV2Relation` into a
  *     `DataSourceV2ScanRelation` (the builder claims no pushdown, so
  *     Filter/Project still sit ABOVE it — exactly where
  *     [[PruneLogScan]] wants them). Both shapes are matched; the
  *     output attributes are reused verbatim so parent references
  *     stay valid, and [[PruneLogScan]] (same batch, fixed point)
  *     expands the substituted leaf.
  *   - ROW-LEVEL command targets are left untouched: a
  *     DELETE/UPDATE/MERGE that reaches the optimizer un-intercepted
  *     must fail with Spark's own "not supported" error on the V2
  *     relation, not silently become a plain scan. (V2 WRITE commands
  *     need no guard — `AppendData.table` is not a child, transforms
  *     never visit it.) The graft DML face intercepts these verbs at
  *     parse time, so on a graft-aware session they never get here.
  *   - Snapshot pinning: the substituted leaf reuses the SNAPSHOT the
  *     catalog's `loadTable` resolved (including `VERSION AS OF` /
  *     `TIMESTAMP AS OF` pins), so plans stay snapshot-isolated.
  */
object ResolveGraftCatalogReads extends Rule[LogicalPlan] {

  val CONF_KEY = "spark.graft.catalogReads.enabled"

  /** Idempotently register on a live session — installs [[PruneLogScan]]
    * too: a substituted leaf without its expansion rule would never
    * reach physical planning. (The builder path, `GraftExtensions`,
    * injects both.) */
  def install(spark: SparkSession): Unit = {
    PruneLogScan.install(spark)
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(CONF_KEY, "true").toBoolean) return plan
    // identity set of every node under a row-level command's TARGET
    // subtree (the target is the command's child, unlike V2 writes)
    val guarded = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    def guard(p: LogicalPlan): Unit = p.foreach(n => guarded.add(n))
    plan.foreach {
      case d: DeleteFromTable => guard(d.table)
      case u: UpdateTable => guard(u.table)
      case m: MergeIntoTable => guard(m.targetTable)
      // metadata columns on a STREAMING read refuse per batch: Spark
      // resolves them against the table (AddMetadataColumns appends
      // the referenced attrs to the relation output) but never prunes
      // them into the streaming scan (V2ScanRelationPushDown matches
      // batch relations only) — the stream's rows carry only data
      // columns, so codegen would bind the metadata ordinals past the
      // row's width (loud AIOOBE at best, a silently misread column
      // when the data row is wide enough). Fail with guidance instead.
      case s: org.apache.spark.sql.execution.datasources.v2
          .StreamingDataSourceV2ScanRelation
          if s.stream.isInstanceOf[graft.catalog.GraftMicroBatchStream] =>
        val st = s.stream.asInstanceOf[graft.catalog.GraftMicroBatchStream]
        val data = st.dataFieldNames
        val meta = s.output.map(_.name)
          .filter(n => (n == "_version" || n == "_file" || n == "_pos")
            && !data(n))
        if (meta.nonEmpty) sys.error(
          s"streaming read of ${st.tableNameForErrors}: metadata " +
            s"column(s) ${meta.mkString(", ")} are batch-only — " +
            "Spark does not prune metadata columns into a streaming " +
            "scan; read the commit version from the stream's batch " +
            "boundary instead, or join a batch read of the table for " +
            "file/position identity")
      case _ => ()
    }
    plan.transformDownWithSubqueries {
      case s: DataSourceV2ScanRelation if !guarded.contains(s) &&
          s.relation.table.isInstanceOf[GraftTable] =>
        val t = s.relation.table.asInstanceOf[GraftTable]
        GraftLogRelation(t.path, t.snapshot, s.output)
      case r: DataSourceV2Relation if !guarded.contains(r) &&
          r.table.isInstanceOf[GraftTable] =>
        val t = r.table.asInstanceOf[GraftTable]
        GraftLogRelation(t.path, t.snapshot, r.output)
    }
  }
}
