package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing (pretraining batch assembly) as a
  * DISTRIBUTED PREFIX SUM.
  *
  * The naive form — one running-total window per language stream — funnels
  * each stream through a single task: 100 TB / #streams per partition.
  * The scalable form decomposes the running total by associativity:
  *
  *   1. shard each stream into contiguous order-key ranges;
  *   2. local cumulative sums inside each (stream, shard) window — bounded
  *      by shard size, embarrassingly parallel;
  *   3. per-shard totals (one row per shard — thousands of rows, not
  *      billions) get a prefix scan over shards, a window over the TINY
  *      aggregate;
  *   4. broadcast the shard offsets back and add.
  *
  * The result is bit-identical to the single-window form (prefix sums are
  * associative), which is exactly what the DuckDB oracle computes.
  */
object PackOps {

  /** Chunk id per row: floor(cumulative tokens BEFORE this row / budget),
    * cumulative within `streamCol` in `orderCol` order. */
  def packChunks(df: DataFrame, streamCol: String, orderCol: String,
      tokCol: String, budget: Long, shardSize: Long = 100000L): DataFrame = {
    val sharded = df.withColumn("__shard", expr(s"$orderCol div $shardSize"))
    val local = sharded.withColumn("__local_cum",
      coalesce(sum(tokCol).over(
        Window.partitionBy(col(streamCol), col("__shard")).orderBy(orderCol)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offsets = sharded.groupBy(streamCol, "__shard")
      .agg(sum(tokCol).as("__shard_tot"))
      .withColumn("__offset",
        coalesce(sum("__shard_tot").over(
          Window.partitionBy(streamCol).orderBy("__shard")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(streamCol), col("__shard"), col("__offset"))
    local.join(broadcast(offsets), Seq(streamCol, "__shard"))
      .withColumn("chunk",
        expr(s"(__local_cum + __offset) div $budget"))
      .drop("__shard", "__local_cum", "__offset")
  }
}
