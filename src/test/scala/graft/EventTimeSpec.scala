package graft

import graft.core.EventTime
import org.apache.spark.sql.functions._

/** The events.ts physical type has changed under the engine once
  * (TIMESTAMP(NANOS)-as-int64 through round 9, timestamp[us] from round
  * 10) — this spec keeps BOTH shapes working by construction: the same
  * instants written both ways must normalize to identical values through
  * either EventTime rewrite, so the next silent testdata regeneration in
  * either direction is absorbed, not debugged. */
class EventTimeSpec extends SparkSpec {

  import spark.implicits._

  // one exact microsecond instant set (micros since epoch)
  private val micros = Seq(0L, 1L, 1700000000000000L, 1700003661234567L)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("long-nanos and timestamp[us] files normalize identically") {
    // shape A: LongType epoch nanoseconds (the legacy nanosAsLong read)
    val nanosDir = tmp("graft_ts_nanos")
    micros.map(_ * 1000L).toDF("ts")
      .withColumn("event_id", monotonically_increasing_id())
      .write.mode("overwrite").parquet(nanosDir)
    // shape B: proper microsecond timestamps stored WITHOUT timezone
    // adjustment — reads back as TIMESTAMP_NTZ, the current testdata shape
    val microsDir = tmp("graft_ts_micros")
    micros.toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .withColumn("event_id", monotonically_increasing_id())
      .write.mode("overwrite").parquet(microsDir)

    def readNanos(dir: String) =
      EventTime.toNanos(spark.read.parquet(dir))
        .select(col("ts")).collect().map(_.getLong(0)).sorted.toSeq
    val a = readNanos(nanosDir)
    val b = readNanos(microsDir)
    assert(a == micros.map(_ * 1000L).sorted, s"nanos shape drifted: $a")
    assert(a == b, s"the two physical shapes disagree: $a vs $b")

    // toTimestamp: identical instants as TIMESTAMP from either shape
    def readTs(dir: String) =
      EventTime.toTimestamp(spark.read.parquet(dir))
        .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted.toSeq
    assert(readTs(nanosDir) == micros.sorted)
    assert(readTs(microsDir) == micros.sorted)

    // the canonical downstream idiom survives both: `ts div 1000` = micros
    assert(EventTime.toNanos(spark.read.parquet(microsDir))
      .select(expr("ts div 1000").cast("long")).collect()
      .map(_.getLong(0)).sorted.toSeq == micros.sorted)
  }

  test("a ts-less table and an unsupported ts type behave predictably") {
    val df = Seq((1L, "a")).toDF("id", "name")
    assert(EventTime.toNanos(df).collect().toSeq ==
      df.collect().toSeq) // no ts column → untouched
    val bad = Seq(("2024-01-01", 1L)).toDF("ts", "id")
    intercept[RuntimeException] { EventTime.toNanos(bad) } // at construction
  }
}
