package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO (CDC upsert) as one declarative plan — the missing lakehouse
  * write primitive next to compaction (o27) / Z-order (o28) / dynamic
  * partition overwrite (o24). The reference re-imports whole studies to
  * update them (ReplacingMergeTree semantics, cf. reference
  * clickhouse/schema.go and cna/transformer.go:438-459 replace keys); MERGE
  * is the row-level form a 100 TB lakehouse actually runs.
  *
  * Semantics (SQL MERGE):
  *   - matched (key in both)            -> source row (WHEN MATCHED UPDATE),
  *                                         or dropped if `deleteWhen` fires
  *                                         (WHEN MATCHED AND cond DELETE)
  *   - not matched by source            -> target row unchanged
  *   - not matched by target            -> source row (WHEN NOT MATCHED INSERT)
  *
  * Scale shape: ONE full-outer shuffle join on the merge key (broadcast if
  * the CDC batch is small — Spark picks it from stats/AQE; at 100 TB the
  * CDC batch is always the small side). No driver loops, no per-row RPC.
  * Output columns are exactly the target's, so the result can overwrite the
  * target in place; pair with dynamic partition overwrite (o24) to rewrite
  * only the partitions the CDC batch touches — see `touchedPartitions`.
  */
object MergeOps {

  /** Merge `source` into `target` on equality of `keys`.
    *
    * `source` must carry every target column (same names); extra source
    * columns (e.g. a CDC delete flag) are usable in `deleteWhen` and are
    * dropped from the output. `deleteWhen` is evaluated against MATCHED
    * source rows only (SQL `WHEN MATCHED AND cond THEN DELETE`).
    *
    * Duplicate source keys RAISE at execution (SQL MERGE's
    * multiple-match error), rather than silently fanning out target rows
    * through the full-outer join. The guard is in-plan — a `count` window
    * over the source keys feeding a `raise_error` branch — so the
    * unique-key case pays no extra job, and the window's required
    * key-partitioning is the same one the join needs. It is a FILTER
    * condition, not an output column: a Project column is pruned the
    * moment a consumer stops referencing it (`.select("v")`, `.count()`),
    * silently disabling the error, while a Filter condition survives any
    * downstream pruning. It also runs BEFORE the `deleteWhen` filter, so
    * duplicate keys raise even when every duplicate row satisfies the
    * delete condition — SQL MERGE errors on the second touch of a target
    * row, DELETE included. */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
      deleteWhen: Option[Column] = None): DataFrame = {
    val outCols = target.columns.toSeq
    require(outCols.forall(source.columns.contains),
      s"source must carry every target column; missing " +
        s"${outCols.filterNot(source.columns.contains).mkString(",")}")
    // presence flags, not key-null checks: a null key in the DATA must not
    // read as "row absent" (full-outer emits null keys for absent sides)
    val t = target.withColumn("__t_present", lit(1)).alias("__t")
    val keyCount = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*))
    val s = source.withColumn("__s_present", lit(1))
      .withColumn("__s_keycnt", keyCount).alias("__s")
    val cond = keys.map(k => col(s"__t.$k") === col(s"__s.$k")).reduce(_ && _)
    val joined = t.join(s, cond, "full_outer")
    val matched =
      col("__t.__t_present").isNotNull && col("__s.__s_present").isNotNull
    val srcOnly =
      col("__t.__t_present").isNull && col("__s.__s_present").isNotNull
    // null keys are exempt: they can never MATCH (SQL equality), so
    // multiple null-key source rows are independent inserts, not the
    // multiple-match error. On a target-only row the whole __s side is
    // null, so the condition falls through to `otherwise(true)` — the
    // predicate never filters out null-extended rows, which also keeps
    // EliminateOuterJoin from demoting the full outer join.
    val sKeysNotNull = keys.map(k => col(s"__s.$k").isNotNull).reduce(_ && _)
    val guarded = joined.where(
      when(col("__s.__s_keycnt") > 1 && sKeysNotNull,
        raise_error(concat(
          lit("MERGE: multiple source rows for key ("),
          concat_ws(",", keys.map(k => col(s"__s.$k").cast("string")): _*),
          lit(")"))).cast("boolean"))
        .otherwise(lit(true)))
    val kept = deleteWhen match {
      case Some(d) => guarded.where(!(matched && d))
      case None    => guarded
    }
    kept.select(outCols.map { c =>
      when(matched || srcOnly, col(s"__s.$c")).otherwise(col(s"__t.$c")).as(c)
    }: _*)
  }

  /** Distinct values of `partCol` the CDC batch touches — the partition
    * pruning list for a merge-write: read/rewrite ONLY these partitions
    * (dynamic overwrite), leave the rest of the table's files untouched.
    * Collect is bounded by partition count, not data size. */
  def touchedPartitions(source: DataFrame, partCol: String): Seq[Any] =
    source.select(col(partCol)).distinct().collect().map(_.get(0)).toSeq

  /** Partition-pruned MERGE against a partitioned parquet table at `path`:
    * only partitions the CDC batch touches are read, merged, and rewritten
    * (staged write + audited per-partition swap); untouched partitions
    * keep their exact files. This is the 100 TB merge: cost scales with
    * the CDC batch's partition footprint, not table size.
    *
    * "Touched" = the source rows' partition values UNION the partitions
    * currently holding any merged key. The union matters when a CDC row
    * moves a key to a different `partCol` value: the stale row lives in a
    * partition the source never mentions, and pruning to source partitions
    * alone would leave the key duplicated across partitions. Finding those
    * costs one column-pruned (keys, partCol) scan of the target
    * semi-joined against the CDC key set (UNHINTED — the planner
    * broadcasts a small batch's keys and degrades a bulk backfill to a
    * shuffle join under the AQE size gate, the same in-plan pattern as
    * the incremental dedup probes) — skippable via
    * `partitionKeyStable = true` when `partCol` is functionally determined
    * by the key (then source and target partitions coincide by contract).
    * Partitions left EMPTY by the merge (all rows moved out or deleted)
    * are dropped at publish time. */
  def mergeWritePartitioned(spark: org.apache.spark.sql.SparkSession,
      path: String, source: DataFrame, keys: Seq[String], partCol: String,
      deleteWhen: Option[Column] = None,
      partitionKeyStable: Boolean = false): Unit = {
    val srcParts = touchedPartitions(source, partCol)
    val tgtParts =
      if (partitionKeyStable) Nil
      else spark.read.parquet(path)
        .select((keys :+ partCol).map(col): _*)
        .join(source.select(keys.map(col): _*).distinct(),
          keys, "left_semi")
        .select(col(partCol)).distinct().collect().map(_.get(0)).toSeq
    val touched = (srcParts ++ tgtParts).distinct
    // partition dirs are addressed via Hive-escaped "$partCol=$value"
    // names at publish time (StagedCommit.partDirName, matching Spark's
    // writer); a null value writes to parquet's __HIVE_DEFAULT_PARTITION__ dir
    // instead and would escape both pruning and cleanup — reject it here
    // rather than corrupt silently
    require(!touched.contains(null),
      s"mergeWritePartitioned: null $partCol values are not supported " +
        "(null partitions are not addressable for the per-partition swap)")
    val slice = spark.read.parquet(path)
      .where(col(partCol).isin(touched: _*))
    // localCheckpoint materializes the merge ONCE: both the audit's
    // expected count and the staged write read the checkpoint instead of
    // re-running the join. Materialized size = the CDC partition footprint.
    val merged = merge(slice, source, keys, deleteWhen).localCheckpoint(true)
    val expected = merged.count()
    // write-audit-publish (graft.sinks.StagedCommit): the staged write
    // also dissolves the read-overwrite-same-path hazard — the live table
    // keeps serving until the audited staging dirs swap in per-partition,
    // and a crash before publish leaves it byte-identical. Partitions the
    // merge emptied are dropped by publishPartitions.
    val staged = graft.sinks.StagedCommit.stage(spark, path, expected) { st =>
      merged.write.partitionBy(partCol).parquet(st)
    }
    graft.sinks.StagedCommit.publishPartitions(staged, partCol, touched)
  }
}
