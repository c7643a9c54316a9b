package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twins of the batch E8 suite: the same transforms produce the
  * same results whether driven by readStream or read — which is the point
  * of expressing them over the unified API. */
class StreamingSpec extends SparkSpec {

  // the file stream source requires a DIRECTORY of files
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf("0.001") + "/events.parquet"),
      dir.resolve("part-0.parquet"))
    dir.toString
  }

  private def eventsWithTs = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    StreamingOps.readEventsStream(spark, eventsDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  test("streaming tumbling window matches batch aggregation") {
    val streamed = StreamingOps.runToMemory(
      StreamingOps.tumblingCounts(eventsWithTs),
      "tumbling_out", OutputMode.Append())
      .select(unix_timestamp(col("bucket_start")).as("b"), col("event_type"),
        col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(sf("0.001") + "/events.parquet")
      .withColumn("tsm", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("tsm"), "10 minutes"), col("event_type"))
      .agg(count("*").as("n"))
      .select(unix_timestamp(col("window.start")).as("b"), col("event_type"),
        col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    // Append mode only emits windows the watermark has passed: windows near
    // the end of input stay buffered in state — so streamed ⊆ batch, and
    // anything missing must lie within watermark+window of the max event.
    assert(streamed.subsetOf(batch))
    assert(streamed.nonEmpty)
    val maxBucket = batch.map(_._1).max
    val horizon = maxBucket - (30 + 10) * 60
    assert((batch -- streamed).forall(_._1 >= horizon))
  }

  test("streaming session windows match batch session_window") {
    val streamed = StreamingOps.runToMemory(
      StreamingOps.sessionAggregates(eventsWithTs),
      "session_out", OutputMode.Append())
      .select(unix_timestamp(col("session_start")).as("s"), col("user_id"),
        col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(sf("0.001") + "/events.parquet")
      .withColumn("tsm", timestamp_micros(expr("ts div 1000")))
      .groupBy(session_window(col("tsm"), "30 minutes"), col("user_id"))
      .agg(count("*").as("n"))
      .select(unix_timestamp(col("session_window.start")).as("s"),
        col("user_id"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // append mode holds back sessions the watermark hasn't closed
    assert(streamed.subsetOf(batch))
    assert(streamed.size > batch.size / 2)
  }

  test("mapGroupsWithState running totals match batch groupBy") {
    val streamed = StreamingOps.runToMemory(
      StreamingOps.runningUserTotals(eventsWithTs).toDF(),
      "state_out", OutputMode.Update())
    // one microbatch → latest state per user = full aggregate
    val got = streamed.groupBy("user_id").agg(max("n").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val want = spark.read.parquet(sf("0.001") + "/events.parquet")
      .groupBy("user_id").agg(count("*").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }
}
