package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
