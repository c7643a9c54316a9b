package graft.operators

import graft.core.Schemas
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** MAF transforms — O13 (mutation_event projection), O14 (mutation
  * projection), O15 (schema-drift-tolerant column lookup), O16 (contiguous
  * global sequence id). Reference: mutation/transformer.go:312-418.
  */
object MutationOps {

  /** O15: drift-tolerant column — present column by name, else literal ""
    * (mutation/transformer.go:312-325 `getFieldValue`, missing→"").
    *
    * The reference resolves the column by a linear name scan *per cell*
    * (O(rows×fields×cols)); here presence is resolved once at plan-build
    * time and Catalyst compiles either a column ref or a constant — the
    * per-cell cost disappears (SURVEY.md §4.2 "known perf bug").
    */
  def colOrEmpty(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) coalesce(col(name).cast("string"), lit(""))
    else lit("")

  /** O13: MAF → `mutation_event` columns (sans id — see withContiguousId).
    * 13 by-name MAF lookups + 7 always-"" fields
    * (mutation/transformer.go:350-371, schema :254-276). */
  def eventProjection(df: DataFrame): Seq[Column] =
    Schemas.mutationEventColumns.map { case (out, src) =>
      (if (src.isEmpty) lit("") else colOrEmpty(df, src)).as(out)
    }

  /** O14: MAF → `mutation` columns (sans id): profile id, prefixed
    * SAMPLE_ID = study + "_" + Tumor_Sample_Barcode
    * (mutation/transformer.go:377-380), 24 by-name lookups,
    * ANNOTATION_JSON always "" (:407). */
  def mutationProjection(df: DataFrame, study: String, profile: String): Seq[Column] =
    Seq(
      lit(profile).as("GENETIC_PROFILE_ID"),
      CnaOps.prefixed(study, colOrEmpty(df, "Tumor_Sample_Barcode")).as("SAMPLE_ID")) ++
      Schemas.mutationColumns.map { case (out, src) => colOrEmpty(df, src).as(out) } :+
      lit("").as("ANNOTATION_JSON")

  /** O16: contiguous global sequence id starting at `start`
    * (mutation/transformer.go:217-247 across batches, :30-52 across files).
    *
    * `monotonically_increasing_id` is non-contiguous by design, and a global
    * `row_number()` window funnels everything through one partition — neither
    * is acceptable. `zipWithIndex` computes per-partition counts in one extra
    * narrow job and assigns contiguous offsets per partition: distributed,
    * no shuffle, order = partition order (file/offset order for a scan).
    */
  /** Previous withContiguousId call's persisted input, released on the next
    * call (same lifecycle pattern as SparkEntry.e10PrevCaches): per-file
    * import pipelines materialize each file's outputs before the next file
    * starts, so at most one cache is live. */
  private var seqIdPrevCache:
      Option[org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]] = None
  private val seqIdCacheLock = new Object

  /** Release the persisted input of the most recent `withContiguousId`
    * call. Callers that have fully materialized the last result (or are
    * shutting down) can use this instead of waiting for the next call's
    * implicit release. */
  def releaseSeqIdCache(): Unit = seqIdCacheLock.synchronized {
    seqIdPrevCache.foreach(_.unpersist(blocking = false))
    seqIdPrevCache = None
  }

  /** SINGLE-LIVE-RESULT CONTRACT: each call unpersists the previous call's
    * cached input, so only the most recent returned DataFrame has its
    * global sort pinned. An earlier result kept around lazily stays
    * CORRECT (ids were assigned from the collected per-partition counts,
    * which don't change) but silently recomputes its upstream sort on next
    * evaluation — materialize each result before calling again, and use
    * [[releaseSeqIdCache]] when done with the last one. This mirrors the
    * per-file import pipeline, which fully writes file N's outputs before
    * file N+1 starts (mutation/transformer.go:30-52). */
  def withContiguousId(df: DataFrame, idName: String = "MUTATION_EVENT_ID",
      start: Long = 0L): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
    import org.apache.spark.sql.graft.Bridge
    val outSchema = StructType(
      StructField(idName, LongType, nullable = false) +: df.schema.fields)
    // zipWithIndex's structure (per-partition counts in one narrow job,
    // offsets broadcast, ids assigned partition-locally) — but over
    // InternalRows: `df.rdd` would deserialize every row to a boxed Row and
    // createDataFrame would re-encode it; this stays in the unsafe format.
    //
    // Persisted between the count pass and the stamp pass: without it both
    // passes re-evaluate the upstream plan (for the import workload that
    // upstream is a GLOBAL SORT — at 100 TB running it twice is the
    // dominant cost). The copy is required because the scan reuses its
    // UnsafeRow buffer; the previous call's cache is released via the memo.
    val rdd = Bridge.internalRows(df)
      .mapPartitions(it => it.map(_.copy()))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    seqIdCacheLock.synchronized {
      seqIdPrevCache.foreach(_.unpersist(blocking = false))
      seqIdPrevCache = Some(rdd)
    }
    val counts = rdd
      .mapPartitionsWithIndex { case (i, it) => Iterator((i, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(start)(_ + _)
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val stamped = rdd.mapPartitionsWithIndex { case (i, it) =>
      val proj = UnsafeProjection.create(outSchema)
      val idRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      var id = bc.value(i)
      it.map { r =>
        idRow.update(0, id)
        id += 1
        // copy: the projection's output buffer is reused per row
        proj(joined(idRow, r)).copy(): InternalRow
      }
    }
    Bridge.fromInternalRows(df.sparkSession, stamped, outSchema)
  }

  /** O13+O14 combined: one id-stamped scan, two projections (the reference
    * emits both tables from a single pass — mutation/transformer.go:330-418).
    * The id stamp is materialized once; both outputs project from it. */
  def transformMaf(df: DataFrame, study: String, profile: String,
      startEventId: Long = 0L): (DataFrame, DataFrame) = {
    val stamped = withContiguousId(df, start = startEventId)
    val id = col("MUTATION_EVENT_ID")
    val events = stamped.select(id +: eventProjection(df): _*)
    val mutations = stamped.select(id +: mutationProjection(df, study, profile): _*)
    (events, mutations)
  }
}
