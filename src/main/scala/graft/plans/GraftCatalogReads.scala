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
      // ALTER TABLE ADD CONSTRAINT … CHECK plans its existing-data
      // validation scan as the command's child; the V2 strategy needs
      // that shape intact to plan the exec (same reasoning as the
      // row-level targets)
      case a: AddCheckConstraint => guard(a.child)
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
        // AddMetadataColumns appends the table's WHOLE metadata-column
        // set to a streaming relation once any one is referenced —
        // guard on the columns the plan actually CONSUMES, not the
        // appended output
        // per-node `references` (expression refs MINUS the node's own
        // produced attributes — a leaf's output rides productIterator
        // and would otherwise count itself as consumed)
        val consumed = org.apache.spark.sql.catalyst.expressions
          .AttributeSet(plan.collect { case n => n.references }
            .flatten)
        val used = s.output.filter(consumed.contains).map(_.name)
        val cdc = used
          .filter(n => (n == graft.sinks.TableLog.changeTypeCol ||
            n == graft.sinks.TableLog.changeVersionCol) && !data(n))
        if (cdc.nonEmpty) sys.error(
          s"streaming read of ${st.tableNameForErrors}: " +
            s"${cdc.mkString(", ")} are change-feed columns — stream " +
            "the __changes face, or use readChangeFeed on a session " +
            "built with GraftExtensions")
        val meta = used
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
        if (s.relation.options.getBoolean("readChangeFeed", false))
          changesSwap(t, s.output, s.relation.options)
        else substitute(t, s.output)
      case r: DataSourceV2Relation if !guarded.contains(r) &&
          r.table.isInstanceOf[GraftTable] =>
        val t = r.table.asInstanceOf[GraftTable]
        if (r.options.getBoolean("readChangeFeed", false))
          changesSwap(t, r.output, r.options)
        else substitute(t, r.output)
    }
  }

  private def substitute(t: GraftTable,
      output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
      : LogicalPlan = {
    // the CDC metadata columns resolve on any session (so the
    // readChangeFeed batch face works without GraftExtensions), but
    // they only MEAN anything under the option — a plain read
    // referencing them must refuse, not serve nulls
    val dataNames = t.schema().fieldNames.toSet
    val cdc = output.map(_.name).filter(n =>
      (n == graft.sinks.TableLog.changeTypeCol ||
        n == graft.sinks.TableLog.changeVersionCol) && !dataNames(n))
    if (cdc.nonEmpty) sys.error(
      s"read of ${t.name}: ${cdc.mkString(", ")} are change-feed " +
        "columns — add .option(\"readChangeFeed\", \"true\") to the " +
        s"read, or use the ${t.name}__changes face")
    GraftLogRelation(t.path, t.snapshot, output)
  }

  /** The `readChangeFeed` BATCH face for live sessions (`install`):
    * re-point the read at the table's published change feed. The
    * analyzer already resolved the relation's output — data columns,
    * plus `_change_type`/`_change_version` when referenced (they are
    * METADATA columns of [[GraftTable]]) — so the swap maps each
    * expected attribute BY NAME onto the changes frame, keeping the
    * original exprIds (parent references stay valid; an optimizer
    * rule must not change plan output). Version windows
    * (`startingVersion`/`startingTag` + `endingVersion`/`endingTag`)
    * resolve through the same [[GraftChangesTable.batchBounds]] the
    * `__changes` face uses — retention-floor fencing and
    * published-frontier bounding included. Sessions built with
    * GraftExtensions never reach this: the analyzer rule re-points
    * the relation first, with the full changes schema in the flat
    * output. */
  private def changesSwap(t: GraftTable,
      output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : LogicalPlan = {
    import graft.sinks.TableLog
    import org.apache.spark.sql.catalyst.expressions.Alias
    require(TableLog.feedEnabled(t.path),
      s"readChangeFeed on ${t.name}: the table has no change feed — " +
        s"TableLog.enableCdcFeed('${t.path}') to capture row changes " +
        "as typed rows (enableFeed for insert-only), then retry")
    val spark = SparkSession.active
    val (lo, hi) = graft.catalog.GraftChangesTable.batchBounds(
      t.path, t.name, options)
    val child = TableLog.readFeedBetween(spark, t.path, lo, hi)
      .queryExecution.analyzed
    val byName = child.output.map(a => a.name -> a).toMap
    Project(output.map { a =>
      val src = byName.getOrElse(a.name, sys.error(
        s"readChangeFeed on ${t.name}: column ${a.name} is not " +
          "served by the change feed"))
      Alias(src, a.name)(exprId = a.exprId)
    }, child)
  }
}
