package graft.operators

import graft.functions.ZOrderLong
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout management — the table-maintenance operators a 100 TB
  * lakehouse pipeline runs continuously (no counterpart in the reference,
  * whose outputs are written once per study; at warehouse scale layout IS
  * a first-class operator).
  *
  *  - `compact`: small-file compaction. Streaming ingestion and
  *    fine-grained partitioning strand tables in thousands of KB-sized
  *    files whose per-file open/footer cost dominates scans; compaction
  *    rewrites them into target-sized files with a NARROW coalesce (no
  *    shuffle — reducing file count needs no data movement).
  *  - `zOrderWrite`: multi-dimensional clustering. Range-partition + sort
  *    by the Morton interleave of two normalized keys, so per-file min/max
  *    stats become selective for predicates on EITHER dimension — the
  *    data-skipping layout single-column sorting cannot give.
  */
object LayoutOps {

  /** Total on-disk bytes and file count of a parquet directory. */
  def dirStats(spark: SparkSession, dir: String): (Long, Int) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var bytes = 0L
    var files = 0
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) { bytes += f.getLen; files += 1 }
    }
    (bytes, files)
  }

  /** Rewrite `inDir` into `outDir` with ~`targetBytes`-sized files.
    * Returns (filesBefore, filesAfter). Narrow: coalesce merges partitions
    * without a shuffle — each output task concatenates whole input splits,
    * so compaction cost is one read+write pass, no exchange. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): (Int, Int) = {
    val (bytes, filesBefore) = dirStats(spark, inDir)
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir).coalesce(parts)
      .write.mode("overwrite").parquet(outDir)
    (filesBefore, dirStats(spark, outDir)._2)
  }

  /** In-place compaction under the write-audit-publish protocol
    * (graft.sinks.StagedCommit): the rewrite lands in a staging dir, its
    * footer row count must equal the source's, and only then does the
    * directory swap in — a crash at any point before publish leaves the
    * live table byte-identical. Returns (filesBefore, filesAfter). */
  def compactInPlace(spark: SparkSession, dir: String,
      targetBytes: Long): (Int, Int) = {
    val (bytes, filesBefore) = dirStats(spark, dir)
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val src = spark.read.parquet(dir)
    val expected = src.count() // parquet footer metadata, no data scan
    graft.sinks.StagedCommit.writeAuditPublish(spark, dir, expected) { st =>
      src.coalesce(parts).write.parquet(st)
    }
    (filesBefore, dirStats(spark, dir)._2)
  }

  /** In-place z-order re-cluster, same write-audit-publish contract. */
  def zOrderInPlace(spark: SparkSession, dir: String, nFiles: Int,
      colA: String, rangeA: (Long, Long), colB: String,
      rangeB: (Long, Long)): Unit = {
    val src = spark.read.parquet(dir)
    val expected = src.count()
    graft.sinks.StagedCommit.writeAuditPublish(spark, dir, expected) { st =>
      src.withColumn("__z", ZOrderLong.zOrder(
          norm16(col(colA), rangeA._1, rangeA._2),
          norm16(col(colB), rangeB._1, rangeB._2)))
        .repartitionByRange(nFiles, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.parquet(st)
    }
  }

  /** `x` min/max-normalized to [0, 65535] as a long (z-order input).
    * Two exact-integer forms, picked by span at plan-build time: the
    * multiply-first form `(x-min)*65535/span` overflows Long once
    * `span ≥ ~2^47` (65535 ≈ 2^16 of headroom), so wide key ranges —
    * plausible for synthetic 64-bit ids — switch to divide-first
    * fixed-width bucketing `(x-min)/ceil(span/65536)`, which also lands in
    * [0, 65535] and never overflows. */
  def norm16(x: Column, min: Long, max: Long): Column = {
    val span = (BigInt(max) - BigInt(min)).max(BigInt(1))
    if (span <= BigInt(1L << 46))
      ((x - lit(min)) * lit(65535L) / lit(span.toLong)).cast("long")
    else if (span < BigInt(Long.MaxValue)) {
      // multiply-first would overflow; (x-min) itself still fits in Long
      val bucket = (span / 65536 + 1).toLong
      ((x - lit(min)) / lit(bucket)).cast("long")
    } else {
      // span exceeds Long entirely (e.g. full 64-bit id range): bucket in
      // double space — monotone, and the ~2^48 bucket width dwarfs the
      // 2^11-ulp double rounding at this magnitude. Rounding can inflate
      // (x-min) past the true span at the extremes, so clamp to 65535.
      val bucket = (span / 65536 + 1).toDouble
      least(lit(65535L),
        ((x.cast("double") - lit(min.toDouble)) / lit(bucket)).cast("long"))
    }
  }

  /** Driver-side scalar TWIN of `norm16` — bit-identical to the Column
    * form at any value (same three span branches, same double-division
    * semantics Spark's `/` uses on longs), so a READER normalizing a
    * query bound lands in exactly the cell the writer's z computation
    * did. Monotone non-decreasing, which is what the box prune's
    * cell-range coverage argument needs. `x` must be within
    * [min, max] (callers clamp query bounds first). */
  def norm16Scalar(x: Long, min: Long, max: Long): Long = {
    val span = (BigInt(max) - BigInt(min)).max(BigInt(1))
    if (span <= BigInt(1L << 46))
      // Spark: Multiply(long,long)=long, Divide(long,long)=double,
      // cast("long") truncates — replicated exactly
      (((x - min) * 65535L).toDouble / span.toLong.toDouble).toLong
    else if (span < BigInt(Long.MaxValue)) {
      val bucket = (span / 65536 + 1).toLong
      ((x - min).toDouble / bucket.toDouble).toLong
    } else {
      val bucket = (span / 65536 + 1).toDouble
      math.min(65535L, ((x.toDouble - min.toDouble) / bucket).toLong)
    }
  }

  /** Write `df` clustered by the z-order of two long columns (each with
    * its [min,max] key range for normalization), into `nFiles` files.
    * Range-partitioning by z gives globally contiguous z-runs per file;
    * the within-partition sort keeps row groups tight too. */
  def zOrderWrite(df: DataFrame, outDir: String, nFiles: Int,
      colA: String, rangeA: (Long, Long), colB: String,
      rangeB: (Long, Long)): Unit = {
    df.withColumn("__z", ZOrderLong.zOrder(
        norm16(col(colA), rangeA._1, rangeA._2),
        norm16(col(colB), rangeB._1, rangeB._2)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Mean per-file min/max span of `c` in `dir`, as a fraction of the
    * global span — the data-skipping selectivity measure: 1.0 means every
    * file covers the whole key range (no skipping possible), k files of
    * perfectly clustered data approach 1/k. */
  def meanFileSpanFraction(spark: SparkSession, dir: String, c: String): Double = {
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
      .agg(avg(col("hi") - col("lo")).as("span"),
        (max("hi") - min("lo")).as("global"))
      .head()
    spans.getDouble(0) / math.max(1.0, spans.getLong(1).toDouble)
  }
}
