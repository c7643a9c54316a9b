package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-aware normalization of the `events.ts` column.
  *
  * The driver's testdata has shipped `events.parquet:ts` under two different
  * physical types across rounds:
  *
  *   - TIMESTAMP(NANOS) — unreadable by Spark's timestamp path; read as
  *     LongType epoch NANOSECONDS under `spark.sql.legacy.parquet.nanosAsLong`;
  *   - timestamp[us]    — read natively as TIMESTAMP_NTZ (micros).
  *
  * The testdata can be regenerated between rounds, so NOTHING downstream may
  * assume a physical type. These two rewrites absorb the difference at the
  * read boundary; every operator sees one canonical shape.
  *
  * Both directions are exact integer arithmetic: epoch micros (~1.7e15) times
  * 1000 stays far below 2^63, and `div` is integral — no float rounding can
  * disagree with the DuckDB oracle's `epoch_us(ts)`.
  *
  * The NTZ→LTZ cast reads the wall clock in the session time zone; every
  * owned session pins UTC (SessionProfile), making the cast the identity on
  * the instant — the same convention DuckDB's `epoch_us` applies to a naive
  * timestamp.
  */
object EventTime {

  def tsType(df: DataFrame): Option[DataType] =
    df.schema.find(_.name == "ts").map(_.dataType)

  /** Rewrite `ts` (in place, position preserved) to LongType epoch
    * NANOSECONDS — the engine's canonical internal shape for event-time
    * arithmetic (`ts div 1000` = micros; integer maths in any engine). */
  def toNanos(df: DataFrame): DataFrame = tsType(df) match {
    case None | Some(LongType)  => df
    case Some(TimestampNTZType) | Some(TimestampType) =>
      df.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    case Some(other) => sys.error(s"events.ts: unsupported type $other")
  }

  /** Rewrite `ts` (in place) to TIMESTAMP (LTZ, micro precision) — the shape
    * the window/session-window/watermark operators want. Works on streaming
    * DataFrames (pure projection). */
  def toTimestamp(df: DataFrame): DataFrame = tsType(df) match {
    case None | Some(TimestampType) => df
    case Some(LongType) =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case Some(TimestampNTZType) =>
      df.withColumn("ts", col("ts").cast(TimestampType))
    case Some(other) => sys.error(s"events.ts: unsupported type $other")
  }
}
