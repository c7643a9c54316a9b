package graft.catalog

import java.util

import graft.sinks.TableLog
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference,
  Coalesce, Expression, GenericInternalRow, JoinedRow, Literal,
  UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{
  InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, ReadMaxFiles,
  SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.graft.{ParquetRead, ParquetReadFactory}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The CHANGES face of a feed-enabled catalog table —
  * `graft.ns.t__changes`: a read-only table whose rows are the
  * table's published change feed (data columns + `_change_type` +
  * `_change_version`), batch-readable (the whole published feed, or a
  * version window via `startingVersion`/`startingTag` +
  * `endingVersion`/`endingTag` — the bounded "what changed between
  * v5 and v9" incremental-ETL read, opening exactly the window's
  * links) and —
  * the point — STREAMABLE: `spark.readStream.table("…__changes")`
  * is a row-level CDC SUBSCRIPTION, the typed complement of the
  * data-stream's refusal on row-changing commits. Offsets are feed
  * versions bounded by the PUBLISHED frontier (a version's links are
  * complete exactly when its `_done` marker exists — a mid-publish
  * crash window can never lose rows, the healing publish re-delivers
  * under the same offset); each micro-batch reads exactly the links
  * the window's versions published. Insert links are raw data files
  * with no stored `_change_type` — the reader serves the constant;
  * CDC capture files carry theirs. Plain (insert-only) feeds stream
  * as all-'insert'; typed (CDC) feeds deliver deletes as typed rows.
  * Exactly-once across restart = consumer checkpoint + immutable
  * per-version link sets. */
final case class GraftChangesTable(path: String, nameStr: String)
    extends Table with SupportsRead {

  override def name(): String = nameStr

  override def schema(): StructType =
    TableLog.changesSchemaOf(SparkSession.active, path)

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = schema()
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = required
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream =
          new GraftChangesStream(path, nameStr, required, options)
        override def toV1TableScan[R <: BaseRelation with TableScan](
            context: SQLContext): R =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = required
            override def buildScan(): RDD[Row] = {
              // the bounded batch CDC read: [startingVersion|Tag,
              // endingVersion|Tag] resolved against the PUBLISHED
              // frontier (same options as the stream plus the ending
              // pair; whole published feed when unbounded). Exactly
              // the window's links are opened.
              val (lo, hi) = GraftChangesTable.batchBounds(path,
                nameStr, options)
              TableLog.readFeedBetween(context.sparkSession, path,
                lo, hi)
                .selectExpr(required.fieldNames.toIndexedSeq
                  .map(n => s"`$n`"): _*).rdd
            }
          }.asInstanceOf[R]
      }
    }
}

object GraftChangesTable {
  /** Batch-read version window from scan options, resolved against
    * the published frontier. Start: `startingVersion` INCLUSIVE
    * (`earliest` — and the absent-option default — means "all
    * RETAINED changes": it clamps to the feed's vacuum floor, so an
    * optionless batch read keeps working after a `vacuumFeed` instead
    * of permanently refusing; an EXPLICIT numeric start below the
    * floor still refuses loudly in [[TableLog.readFeedBetween]] —
    * the caller named versions that are gone. `latest` = nothing-yet,
    * an empty window, the stream's "from now" made batch),
    * `startingTag` EXCLUSIVE (the tag names a state the consumer
    * already holds). End: `endingVersion` INCLUSIVE (`latest`/absent
    * = the frontier), `endingTag` INCLUSIVE (the tag names the state
    * to catch up TO). Each pair is mutually exclusive; an end past
    * the frontier refuses loudly. The changes STREAM deliberately
    * does NOT clamp (a subscription that silently skips retired
    * versions breaks its exactly-once story — it refuses with
    * guidance instead). */
  private[graft] def batchBounds(path: String, tableName: String,
      options: CaseInsensitiveStringMap): (Long, Long) = {
    def exclusive(names: String*): Unit = {
      val set = names.filter(options.get(_) != null)
      require(set.size <= 1, s"changes read of $tableName: " +
        s"${set.mkString(" and ")} are mutually exclusive")
    }
    exclusive("startingVersion", "startingTag", "startingTimestamp")
    exclusive("endingVersion", "endingTag", "endingTimestamp")
    val frontier = TableLog.publishedFrontier(path)
    val sTag = Option(options.get("startingTag")).map(_.trim)
    // startingTimestamp = the first version committed AT or AFTER the
    // instant (epoch millis), INCLUSIVE — "every change from ts
    // onward"; past the newest commit it is an empty window
    val sTs = Option(options.get("startingTimestamp")).map(_.trim.toLong)
    val lo = sTag.map(TableLog.resolveTag(path, _) + 1)
      .orElse(sTs.map(TableLog.versionAtOrAfter(path, _)))
      .getOrElse(
        Option(options.get("startingVersion")).map(_.trim) match {
          case None | Some("earliest") =>
            math.max(0L, TableLog.feedFloor(path))
          case Some("latest") => frontier + 1
          case Some(v) => v.toLong
        })
    val eTag = Option(options.get("endingTag")).map(_.trim)
    // endingTimestamp = the newest version committed AT or BEFORE the
    // instant, INCLUSIVE ("everything that had happened by ts") —
    // resolved by versionAsOf; a resolution past the published
    // frontier refuses in readFeedBetween like a numeric end would
    val eTs = Option(options.get("endingTimestamp")).map(_.trim.toLong)
    val hi = eTag.map(TableLog.resolveTag(path, _))
      .orElse(eTs.map(TableLog.versionAsOf(path, _)))
      .getOrElse(
        Option(options.get("endingVersion")).map(_.trim) match {
          case None | Some("latest") => frontier
          case Some(v) => v.toLong
        })
    (lo, hi)
  }
}

/** Offsets = published feed versions; batches = the window's links. */
final class GraftChangesStream(path: String, tableName: String,
    readSchema: StructType, options: CaseInsensitiveStringMap,
    verIdx: Int = -1, fileIdx: Int = -1, posIdx: Int = -1)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val maxFiles: Option[Int] =
    Option(options.get("maxFilesPerTrigger")).map(_.trim.toInt)

  @volatile private var availableNowBound: Long = -1L
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound = TableLog.publishedFrontier(path)

  /** Same option surface as the data stream: `startingVersion` is
    * INCLUSIVE (deliver the feed FROM that version), `startingTag`
    * EXCLUSIVE (the tag names a state the consumer already holds —
    * deliver the changes after it), `startingTimestamp` INCLUSIVE
    * from the first version committed at or after the instant; all
    * mutually exclusive. */
  private def startingVersion: Long = {
    val names = Seq("startingVersion", "startingTag",
      "startingTimestamp").filter(options.get(_) != null)
    require(names.size <= 1, s"changes stream of $tableName: " +
      s"${names.mkString(" and ")} are mutually exclusive")
    val tag = Option(options.get("startingTag")).map(_.trim)
    val ts = Option(options.get("startingTimestamp")).map(_.trim.toLong)
    tag.map(TableLog.resolveTag(path, _))
      .orElse(ts.map(TableLog.versionAtOrAfter(path, _) - 1))
      .getOrElse(
        Option(options.get("startingVersion")).map(_.trim) match {
          case None | Some("earliest") => 0L
          case Some("latest") => TableLog.publishedFrontier(path)
          case Some(v) => math.max(v.toLong - 1, 0L)
        })
  }

  override def initialOffset(): Offset = GraftStreamOffset(startingVersion)
  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toLong)
  override def getDefaultReadLimit: ReadLimit =
    maxFiles.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())
  override def latestOffset(): Offset =
    latestOffset(GraftStreamOffset(startingVersion), getDefaultReadLimit)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftStreamOffset].version
    val head = TableLog.publishedFrontier(path)
    val frontier =
      if (availableNowBound >= 0) math.min(head, availableNowBound)
      else head
    if (frontier <= from) return GraftStreamOffset(from)
    val cap = limit match {
      case m: ReadMaxFiles => m.maxFiles()
      case _ => Int.MaxValue
    }
    val byVer = TableLog.feedLinksBetween(path, from + 1, frontier)
      .groupBy(_._1)
    var v = from
    var n = 0
    (from + 1 to frontier).foreach { cand =>
      if (v == cand - 1) {
        val add = byVer.getOrElse(cand, Nil).size
        if (n == 0 || n + add <= cap) { v = cand; n += add }
      }
    }
    GraftStreamOffset(v)
  }

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[GraftStreamOffset].version,
      end.asInstanceOf[GraftStreamOffset].version)
    if (e <= s) return Array.empty
    // the batch window [s+1, e] must sit at or above the feed's
    // retention floor: below it, "no links" can mean vacuumFeed
    // retired them, and the stream would silently deliver a partial
    // change log — the exact failure the batch face refuses. Covers
    // both a fresh start (offset from startingVersion/Tag) and a
    // restart whose checkpointed offset fell behind a vacuum.
    val floor = TableLog.feedFloor(path)
    require(s + 1 >= floor,
      s"changes stream of $tableName: the batch starts at version " +
        s"${s + 1} but vacuumFeed retired links below $floor — " +
        s"restart from a fresh checkpoint with startingVersion=$floor " +
        "or later, or re-backfill from the table snapshot")
    TableLog.feedLinksBetween(path, s + 1, e).map { case (v, p) =>
      GraftFilePartition(p.toString, java.nio.file.Files.size(p), v,
        p.getFileName.toString, proj = null)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // parquet decodes the required DATA fields plus `_change_type`
    // (absent in insert links → null → the reader serves 'insert');
    // `_change_version` is the partition's version constant. The
    // vanilla-session readChangeFeed face (GraftTable's scan builder)
    // additionally asks for the table METADATA columns by index —
    // `_version` (= the change version), `_file` (the feed link
    // file), `_pos` (row index within the link) — all spliced, never
    // parquet-decoded; the __changes face passes -1s (its schema has
    // no such fields).
    val splicedIdx =
      Set(readSchema.fieldNames.indexOf(TableLog.changeVersionCol),
        verIdx, fileIdx, posIdx).filter(_ >= 0)
    val dataRequired = StructType(readSchema.fields.zipWithIndex
      .filterNot { case (_, i) => splicedIdx(i) }.map(_._1))
    val ctIdx = dataRequired.fieldNames.indexOf(TableLog.changeTypeCol)
    val cvIdx = readSchema.fieldNames.indexOf(TableLog.changeVersionCol)
    new GraftChangesReaderFactory(
      ParquetRead.factory(SparkSession.active, dataRequired),
      readSchema.fields.map(_.dataType), ctIdx, cvIdx,
      verIdx, fileIdx, posIdx)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Serves rows of the changes schema: parquet row (data fields +
  * possibly-null `_change_type`) → output row with `_change_type`
  * coalesced to 'insert' and `_change_version` (plus, on the
  * vanilla readChangeFeed face, `_version`/`_file`/`_pos`) spliced
  * in — via a codegen'd UnsafeProjection into ONE reused buffer, the
  * same zero-per-row-allocation contract as the data stream's
  * non-identity path: constants (the change version, the link file)
  * fold as literals into the generated code, the row position rides
  * a 1-field row joined LEFT of the parquet row, and the
  * coalesce-to-'insert' happens in generated code. */
final class GraftChangesReaderFactory(pr: ParquetReadFactory,
    outTypes: Array[org.apache.spark.sql.types.DataType],
    ctIdx: Int, cvIdx: Int, verIdx: Int = -1, fileIdx: Int = -1,
    posIdx: Int = -1) extends PartitionReaderFactory {

  private val insertTag = UTF8String.fromString("insert")

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftFilePartition]
    // ctIdx is a PARQUET ordinal (an index into the decoded fields) —
    // with spliced metadata columns the output and parquet ordinals
    // no longer align, so the parquet cursor advances separately
    var parquetIdx = 0
    val exprs: Seq[Expression] = outTypes.indices.map { o =>
      if (o == cvIdx || o == verIdx) Literal(p.version, LongType)
      else if (o == fileIdx)
        Literal(UTF8String.fromString(p.relPath), StringType)
      else if (o == posIdx) BoundReference(0, LongType, nullable = false)
      else {
        val i = parquetIdx; parquetIdx += 1
        if (i == ctIdx) Coalesce(Seq(
          BoundReference(1 + i, StringType, nullable = true),
          Literal(insertTag, StringType)))
        else BoundReference(1 + i, outTypes(o), nullable = true)
      }
    }
    val project = UnsafeProjection.create(exprs)
    val meta = new GenericInternalRow(1)
    val joined = new JoinedRow
    var rowPos = -1L
    val it = pr.open(p.absPath, p.length).map { row =>
      rowPos += 1
      meta.setLong(0, rowPos)
      project(joined(meta, row)): InternalRow
    }
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
