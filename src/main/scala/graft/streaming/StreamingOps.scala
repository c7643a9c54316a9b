package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Structured Streaming counterparts of the batch time-window suite (E8):
  * `readStream` → event-time transforms → `writeStream`, with watermarks
  * bounding state. The same column logic as the batch queries — Spark's
  * unified API means the batch oracle validates the streaming transform.
  *
  * At scale these run with a real source (Kafka/files); here the file
  * source over the driver test parquet + a memory sink exercises the full
  * streaming machinery synchronously (`processAllAvailable`).
  */
object StreamingOps {

  /** File-source stream over an events-shaped parquet directory. The schema
    * must be supplied (streaming reads don't infer). */
  def readEventsStream(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).parquet(path)
  }

  /** Tumbling-window counts/sums per event type with a watermark: the
    * streaming twin of the batch `e8_tumbling` query. `ts` is a proper
    * timestamp column here (caller converts if the source stores longs). */
  def tumblingCounts(events: DataFrame, windowLen: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count("*").as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows per user with a gap timeout — the streaming twin of the
    * batch `e8_session` query. Sessions close (and emit, in append mode)
    * once the watermark passes their gap horizon. */
  def sessionAggregates(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count("*").as("n"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n"), col("sum_value"))

  /** Per-user running state via mapGroupsWithState: event count + running
    * value sum per user, emitted on every update — the custom-state
    * primitive (sessionization, CDC-style dedup, enrichment caches all
    * follow this pattern). */
  final case class UserEvent(user_id: Long, value: Double)
  final case class UserState(user_id: Long, n: Long, total: Double)

  def runningUserTotals(events: DataFrame): Dataset[UserState] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserState](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(uid, 0L, 0.0))
          val next = batch.foldLeft(prev)((s, e) =>
            UserState(uid, s.n + 1, s.total + e.value))
          state.update(next)
          next
      }
  }

  /** Watermarked stream-stream inner join: for each click, purchases by the
    * same user within `horizon` after it. Both sides carry watermarks and
    * the join condition bounds event-time distance, so Spark can expire
    * buffered state — the requirement for an unbounded stream-stream join.
    * Expects (event_id, user_id, ts, value) on both inputs. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      horizon: String = "10 minutes", watermark: String = "30 minutes")
      : DataFrame = {
    val c = clicks.withWatermark("ts", watermark).alias("c")
    val p = purchases.withWatermark("ts", watermark).alias("p")
    c.join(p, expr(
      s"""c.user_id = p.user_id AND
         |p.ts > c.ts AND p.ts <= c.ts + interval $horizon""".stripMargin))
      .select(col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"), col("p.value").as("purchase_value"))
  }

  /** Streaming exact per-key dedup: the first occurrence of each key wins
    * among events arriving within the watermark delay of each other;
    * `dropDuplicatesWithinWatermark` evicts per-key state once the
    * watermark passes it, so state stays bounded WITHOUT having to put the
    * event-time column in the key (plain `dropDuplicates(keys)` on a
    * stream never forgets; `keys :+ ts` dedups per (key, ts) instead of
    * per key). */
  def dedupStream(events: DataFrame, keys: Seq[String],
      watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming near-dup dedup by MinHash SIGNATURE equality: the per-row
    * banded minhash (computed entirely within the row — array transforms
    * over shingles, no shuffle, no state beyond the dedup map) keys a
    * `dropDuplicatesWithinWatermark` — per-signature state is evicted once
    * the watermark passes it, so state stays bounded even though the
    * signature itself is not an event-time column. Documents whose full
    * band signature matches one seen within the watermark delay are
    * dropped — exact dups always, near-dups with probability rising in
    * their similarity. Expects (ts, idCol, textCol); emits the
    * survivors. */
  def minhashDedupStream(docs: DataFrame, idCol: String, textCol: String,
      bands: Int, shingleN: Int = 3, watermark: String = "30 minutes")
      : DataFrame = {
    import graft.functions.{TextFunctions => TF, TextExpressions => TE}
    val sig = {
      val halves = transform(
        array_distinct(TF.shingles(col(textCol), shingleN)),
        s => TE.md5Halves(s))
      // shingle-less (short) docs: fall back to the full-text hash, so they
      // dedup on exact text only instead of all sharing a null signature
      val fb = TE.md5Halves(col(textCol))
      array((0 until bands).map(b =>
        coalesce(
          array_min(transform(halves,
            h => h.getField("h1") + lit(b.toLong) * h.getField("h2"))),
          fb.getField("h1") + lit(b.toLong) * fb.getField("h2"))): _*)
    }
    docs
      .withColumn("__sig", sig)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("__sig")
      .drop("__sig")
  }

  /** Continuous DEDUPED ingest into the commit log: each micro-batch is
    * deduped against the PERSISTENT signature index
    * (DedupOps.incrementalDedup — per-batch cost O(batch + matching
    * buckets), the corpus is never re-signed), survivors land in a
    * TableLog documents table, survivor signatures in the index. Both
    * appends carry batch-derived txn ids, so a crash-restart replay
    * skips whichever append already committed AND reproduces identical
    * decisions (the index probe self-excludes) — end-to-end
    * exactly-once dedup ingest, with the two tables healing
    * independently when a crash lands between their commits. Unlike
    * `minhashDedupStream` (in-memory watermark state, near-dup memory
    * bounded by the watermark), the index here is DURABLE and unbounded
    * in horizon: a duplicate of a document ingested months ago is still
    * dropped. Drains currently available input. */
  def dedupIngestStream(spark: SparkSession, docsTable: String,
      indexTable: String, docs: DataFrame, idCol: String, textCol: String,
      bands: Int, shingleN: Int = 3, streamId: String = "dedup-ingest",
      checkpoint: Option[String] = None): Unit =
    runForeachBatch(docs, OutputMode.Append(), checkpoint) { (batch, batchId) =>
      val dec = graft.operators.DedupOps.incrementalDedup(spark, indexTable,
        batch, idCol, textCol, bands, shingleN,
        txnId = Some(s"$streamId#$batchId#idx"))
      val survivors = batch.join(
        dec.where(!col("dup")).select(col(idCol)), Seq(idCol), "left_semi")
      graft.sinks.TableLog.append(spark, docsTable, survivors,
        txnId = Some(s"$streamId#$batchId#docs"))
      ()
    }

  /** Embedding twin of `dedupIngestStream`: each micro-batch of vectors is
    * deduped against the PERSISTENT block index
    * (DedupOps.incrementalEmbedDedup — batch blocked with the index's
    * pinned sign-bit width, probe pruned to matching-block files, cosine
    * verified on quantized integer dots), survivors land in a TableLog
    * vectors table, survivor block rows in the index. The same two
    * txn-id'd appends give crash-replayed batches byte-identical
    * decisions and independently-healing tables; a COLD start (absent
    * index) derives and pins the width from the first batch. Drains
    * currently available input. */
  def embedIngestStream(spark: SparkSession, vecsTable: String,
      indexTable: String, vecs: DataFrame, idCol: String, vecCol: String,
      blockCol: String, thresholdMicro: Long,
      streamId: String = "embed-ingest",
      checkpoint: Option[String] = None): Unit =
    runForeachBatch(vecs, OutputMode.Append(), checkpoint) { (batch, batchId) =>
      val dec = graft.operators.DedupOps.incrementalEmbedDedup(spark,
        indexTable, batch, idCol, vecCol, blockCol, thresholdMicro,
        txnId = Some(s"$streamId#$batchId#idx"))
      val survivors = batch.join(
        dec.where(!col("dup")).select(col(idCol)), Seq(idCol), "left_semi")
      graft.sinks.TableLog.append(spark, vecsTable, survivors,
        txnId = Some(s"$streamId#$batchId#vecs"))
      ()
    }

  /** Semantic twin of `embedIngestStream`: micro-batches dedup against
    * the persisted Lloyd-cell index (assigned with the codebook version
    * PINNED in the index manifest — a concurrent rebalance can never be
    * half-observed), survivors to the vectors table, survivor cell rows
    * to the index, both txn-id'd. Requires a built index
    * (buildSemanticIndex) — a cell index has no meaningful cold-start
    * codebook from one micro-batch. Drains currently available input. */
  def semanticIngestStream(spark: SparkSession, vecsTable: String,
      indexTable: String, vecs: DataFrame, idCol: String, vecCol: String,
      thresholdMicro: Long, streamId: String = "semantic-ingest",
      checkpoint: Option[String] = None): Unit =
    runForeachBatch(vecs, OutputMode.Append(), checkpoint) { (batch, batchId) =>
      val dec = graft.operators.DedupOps.incrementalSemanticDedup(spark,
        indexTable, batch, idCol, vecCol, thresholdMicro,
        txnId = Some(s"$streamId#$batchId#idx"))
      val survivors = batch.join(
        dec.where(!col("dup")).select(col(idCol)), Seq(idCol), "left_semi")
      graft.sinks.TableLog.append(spark, vecsTable, survivors,
        txnId = Some(s"$streamId#$batchId#vecs"))
      ()
    }

  final case class SessionEvent(user_id: Long, us: Long)
  final case class SessionSummary(user_id: Long, start_us: Long, end_us: Long, n: Long)
  // not private: the state encoder's generated code constructs it reflectively
  final case class OpenSession(start_us: Long, end_us: Long, n: Long)

  /** Custom sessionization via flatMapGroupsWithState: gap-separated
    * sessions per user, emitting each session as it CLOSES — either because
    * a later event left a gap > `gapUs` within the stream, or because the
    * event-time timeout fired (watermark passed the gap horizon with no new
    * events). The primitive behind session semantics `session_window` can't
    * express (e.g. per-session early emit, enriched state). */
  def sessionize(events: Dataset[SessionEvent], gapUs: Long)
      : Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", "30 minutes")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[(Long, Long, java.sql.Timestamp)],
            state: GroupState[OpenSession]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed the gap horizon: close the open session
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(uid, s.start_us, s.end_us, s.n))
          } else {
            val times = batch.map(_._2).toArray.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[SessionSummary]
            times.foreach { t =>
              open match {
                case Some(s) if t - s.end_us < gapUs =>
                  open = Some(OpenSession(s.start_us, t, s.n + 1))
                case Some(s) =>
                  closed += SessionSummary(uid, s.start_us, s.end_us, s.n)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end_us / 1000 + gapUs / 1000)
            }
            closed.result().iterator
          }
      }
  }

  final case class TopKState(items: List[(Long, Long)]) // (value desc, id)
  final case class RankedItem(key: String, rank: Int, id: Long, value: Long)

  /** Streaming grouped top-k via flatMapGroupsWithState: per key, a
    * k-element (value desc, id asc) leaderboard lives in state; each
    * micro-batch merges its rows and re-emits the CURRENT top-k (Update
    * mode). The streaming twin of the TopKByValue bounded-heap aggregate —
    * state is O(k) per key no matter how much history has streamed past.
    * An id appears at most once on the board (its BEST value wins), so
    * at-least-once replays and score updates can never occupy two slots
    * and evict a legitimate entry. Expects (key, id, value) columns. */
  def streamingTopK(rows: DataFrame, keyCol: String, idCol: String,
      valueCol: String, k: Int): Dataset[RankedItem] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col(keyCol).cast("string"), col(idCol).cast("long"),
        col(valueCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TopKState, RankedItem](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[(String, Long, Long)],
            state: GroupState[TopKState]) =>
          val merged =
            (state.getOption.map(_.items).getOrElse(Nil) ++
              batch.map { case (_, id, v) => (v, id) })
              .groupMapReduce(_._2)(identity)((a, b) => if (a._1 >= b._1) a else b)
              .values.toList
              .sortBy { case (v, id) => (-v, id) }
              .take(k)
          state.update(TopKState(merged))
          merged.zipWithIndex.iterator.map { case ((v, id), i) =>
            RankedItem(key, i + 1, id, v)
          }
      }
  }

  /** foreachBatch sink: the escape hatch for targets with no native
    * streaming writer (JDBC/ClickHouse, multi-table fan-out, merge/upsert).
    * Each micro-batch arrives as a PLAIN batch DataFrame plus its batchId.
    * WITH a `checkpoint` location, batchIds survive restarts, so a sink
    * that records the last committed id per target can safely skip
    * replayed batches — the ClickHouse-loading pattern (see ClickHouseSink
    * for the batch write shape this composes with). Without a checkpoint,
    * a restarted query renumbers from 0 and batchId is only unique WITHIN
    * the run. Runs until all currently available input is drained. */
  def runForeachBatch(df: DataFrame, mode: OutputMode,
      checkpoint: Option[String] = None)
      (f: (DataFrame, Long) => Unit): Unit = {
    val w = df.writeStream.outputMode(mode).foreachBatch(f)
    val q = checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
    try q.processAllAvailable()
    finally q.stop()
  }

  final case class UserCount(user_id: Long, n: Long)

  /** Spark 4 `transformWithState` StatefulProcessor: running per-user row
    * count in a named ValueState with a TTL. The successor API to
    * flatMapGroupsWithState — typed state VARIABLES (value/list/map, each
    * independently TTL'd) instead of one state object, explicit timers,
    * RocksDB-backed — i.e. the state model a 100 TB keyspace needs: state
    * lives in the store, not as a deserialized per-key blob on the heap,
    * and idle keys age out by TTL instead of accumulating forever. */
  private class RunningCountProcessor(ttl: Option[java.time.Duration])
      extends StatefulProcessor[Long, Long, UserCount] {
    @transient private var count: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count",
        org.apache.spark.sql.Encoders.scalaLong,
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
    override def handleInputRows(key: Long, rows: Iterator[Long],
        timerValues: TimerValues): Iterator[UserCount] = {
      val n = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(n)
      Iterator.single(UserCount(key, n))
    }
  }

  /** Running per-user event counts via transformWithState (requires the
    * RocksDB state store provider; emits the updated count per key per
    * micro-batch in Update mode). With a TTL the state is clocked by
    * processing time (TTL requires ProcessingTime mode). */
  def runningCountsTws(events: DataFrame,
      ttl: Option[java.time.Duration] = None): Dataset[UserCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long")).as[Long]
      .groupByKey(identity)
      .transformWithState(new RunningCountProcessor(ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }

  final case class SeqPending(events: Seq[graft.operators.SequenceOps.SeqEvent],
      lastWmUs: Long)

  /** Streaming MATCH_RECOGNIZE (Flink-CEP shape): the batch NFA of
    * SequenceOps.matchPattern run incrementally per key under an event-time
    * watermark. Events at or below the watermark are scanned in (us, id)
    * order; an anchor whose verdict still depends on unseen events waits in
    * state until the events arrive or it ages past `withinUs` (CEP's
    * WITHIN clause), at which point it resolves with what arrived — and a
    * match may never span more than `withinUs` from its anchor (the
    * duration bound is enforced during the scan, not just the wait, so a
    * large watermark jump cannot smuggle an over-long match). Arrivals
    * below the previous watermark are late and dropped — the same contract
    * as Spark's own watermarked stateful operators. State per key is the
    * undecided suffix plus above-watermark events: bounded by the pattern
    * window + watermark delay, never by stream length.
    *
    * Input columns: key LONG, us LONG (event-time micros), id LONG,
    * etype STRING. Emits one row per completed match (Append mode). */
  def matchPatternStream(events: DataFrame,
      steps: Seq[graft.operators.SequenceOps.Step],
      delay: String = "30 minutes",
      withinUs: Long = 30L * 60 * 1000000)
      : Dataset[graft.operators.SequenceOps.SeqMatch] = {
    import graft.operators.SequenceOps
    import SequenceOps.{SeqEvent, SeqMatch}
    val spark = events.sparkSession
    import spark.implicits._
    val pat = steps.toIndexedSeq
    events
      .select(col("key").cast("long"), col("us").cast("long"),
        col("id").cast("long"), col("etype").cast("string"),
        timestamp_micros(col("us")).as("ts"))
      .withWatermark("ts", delay)
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SeqPending, SeqMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, batch: Iterator[(Long, Long, Long, String, java.sql.Timestamp)],
            state: GroupState[SeqPending]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000
          val prior = state.getOption.getOrElse(SeqPending(Nil, Long.MinValue))
          val incoming = batch
            .map(t => SeqEvent(t._1, t._2, t._3, t._4))
            .filter(_.us >= prior.lastWmUs) // late: region already resolved
            .toVector
          val (readyRaw, future) =
            (prior.events.toVector ++ incoming).partition(_.us <= wmUs)
          val ready = readyRaw.sortBy(e => (e.us, e.id))
          val (matches, leftover) =
            SequenceOps.scanReady(key, ready, pat, wmUs - withinUs, withinUs)
          val keep = leftover ++ future
          if (keep.isEmpty) state.remove()
          else {
            state.update(SeqPending(keep, wmUs))
            // re-examine as soon as the watermark moves again
            state.setTimeoutTimestamp(wmUs / 1000 + 1)
          }
          matches.iterator
      }
  }

  /** Streaming CEP on the Spark 4 transformWithState API: the same
    * watermark-incremental NFA as `matchPatternStream`, with the state
    * decomposed into typed variables — a ListState of undecided events
    * plus a ValueState watermark floor — and re-examination driven by a
    * real EVENT-TIME TIMER instead of a timeout re-registration. On
    * RocksDB (this API is RocksDB-only) each state variable is its own
    * column family: appending an event does not rewrite the whole per-key
    * blob, which is the difference that matters when a key's pending
    * window is large. */
  private class CepProcessor(steps: IndexedSeq[graft.operators.SequenceOps.Step],
      withinUs: Long)
      extends StatefulProcessor[Long,
        (Long, Long, Long, String, java.sql.Timestamp),
        graft.operators.SequenceOps.SeqMatch] {
    import graft.operators.SequenceOps
    import SequenceOps.{SeqEvent, SeqMatch}
    @transient private var pending: ListState[SeqEvent] = _
    @transient private var wmFloor: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[SeqEvent]("pending",
        org.apache.spark.sql.Encoders.product[SeqEvent], TTLConfig.NONE)
      wmFloor = getHandle.getValueState[Long]("wmFloor",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    private def scan(key: Long, incoming: Vector[SeqEvent], wmUs: Long)
        : Iterator[SeqMatch] = {
      val floor = if (wmFloor.exists()) wmFloor.get() else Long.MinValue
      val all = (if (pending.exists()) pending.get().toVector else Vector.empty) ++
        incoming.filter(_.us >= floor) // below the floor = late, resolved region
      val (readyRaw, future) = all.partition(_.us <= wmUs)
      val ready = readyRaw.sortBy(e => (e.us, e.id))
      val (matches, leftover) =
        SequenceOps.scanReady(key, ready, steps, wmUs - withinUs, withinUs)
      val keep = leftover ++ future
      if (keep.isEmpty) { pending.clear(); wmFloor.clear() }
      else {
        pending.put(keep.toArray)
        wmFloor.update(wmUs)
        getHandle.registerTimer(wmUs / 1000 + 1) // fire on next wm advance
      }
      matches.iterator
    }

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Long, String, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[SeqMatch] =
      scan(key, rows.map(t => SeqEvent(t._1, t._2, t._3, t._4)).toVector,
        timerValues.getCurrentWatermarkInMs() * 1000)

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SeqMatch] =
      scan(key, Vector.empty, timerValues.getCurrentWatermarkInMs() * 1000)
  }

  /** `matchPatternStream` on transformWithState (see CepProcessor). Same
    * input/output contract; requires the RocksDB state store provider. */
  def matchPatternStreamTws(events: DataFrame,
      steps: Seq[graft.operators.SequenceOps.Step],
      delay: String = "30 minutes",
      withinUs: Long = 30L * 60 * 1000000)
      : Dataset[graft.operators.SequenceOps.SeqMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("key").cast("long"), col("us").cast("long"),
        col("id").cast("long"), col("etype").cast("string"),
        timestamp_micros(col("us")).as("ts"))
      .withWatermark("ts", delay)
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(
        new CepProcessor(steps.toIndexedSeq, withinUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Drive a streaming DataFrame to a named in-memory table until all
    * currently-available input is processed; returns the result table.
    * Update mode suits stateful queries; Append for watermarked windows. */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    df.sparkSession.table(name)
  }
}
