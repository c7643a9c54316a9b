package graft.plans

import graft.catalog.{GraftChangesTable, GraftTable}
import graft.sinks.TableLog
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Analyzer resolution rule — the Delta-shaped CDC surface on the
  * table itself:
  *
  *   spark.readStream.option("readChangeFeed", "true")
  *     .table("graft.ns.t")          // typed rows, NOT table rows
  *   spark.read.option("readChangeFeed", "true").table("graft.ns.t")
  *
  * re-points the relation at the table's CHANGES face
  * ([[GraftChangesTable]] — data columns + `_change_type` +
  * `_change_version`), so the stream serves row-level deltas instead
  * of refusing row-changing commits: offsets stay commit versions
  * (bounded by the published-feed frontier, exactly-once across
  * restart), and every changes-face option (`startingVersion`,
  * `startingTag`, `maxFilesPerTrigger`) applies unchanged. The
  * `graft.ns.t__changes` identifier remains the option-free alias —
  * and the path for sessions without extensions, since an analyzer
  * rule (the relation's OUTPUT changes: a resolution-time concern)
  * cannot be injected into a live session the way the optimizer
  * substitution can ([[ResolveGraftCatalogReads.install]]);
  * [[graft.GraftSessions.withExtensions]] bridges those.
  *
  * The swap happens during resolution, so downstream references to
  * `_change_type` / `_change_version` resolve against the new output
  * like any table column. Requires the table's change feed (typed
  * rows need capture); refuses with guidance otherwise. */
object ResolveChangeFeedReads extends Rule[LogicalPlan] {

  private def changesOf(t: GraftTable): GraftChangesTable = {
    require(TableLog.feedEnabled(t.path),
      s"readChangeFeed on ${t.name}: the table has no change feed — " +
        s"TableLog.enableCdcFeed('${t.path}') to capture row changes " +
        "as typed rows (enableFeed for insert-only), then retry")
    GraftChangesTable(t.path, t.name + "__changes")
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case s: StreamingRelationV2 if s.table.isInstanceOf[GraftTable] &&
          s.extraOptions.getBoolean("readChangeFeed", false) =>
        val ct = changesOf(s.table.asInstanceOf[GraftTable])
        s.copy(table = ct,
          output = DataTypeUtils.toAttributes(ct.schema()))
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] &&
          r.options.getBoolean("readChangeFeed", false) =>
        val ct = changesOf(r.table.asInstanceOf[GraftTable])
        r.copy(table = ct,
          output = DataTypeUtils.toAttributes(ct.schema()))
    }
}
