package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.TableLog

/** Declarative-scan observability: on a range-clustered log table of n
  * rows / F files, measures (a) `scan().where(range)` — the optimizer
  * rule path — against the hand-written `readWhere` face and the naive
  * `read().where` full scan, and (b) an inner join against a tiny dim
  * with the dynamic join prune ON vs OFF. Files-opened counts come from
  * the optimized plan (the same pin LogScanSpec asserts), wall-clock
  * from executed counts; results are cross-checked identical before
  * any number is reported — the claim is "the rule costs nothing over
  * the hand-written face and turns join pruning on for free", pinned
  * by plan AND stopwatch.
  *
  *   sbt "runMain graft.tools.ScanStats [n] [files]"   (default 4M / 64)
  *
  * Prints one JSON line.
  */
object ScanStats {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(4000000L)
    val files = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionProfile.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def filesOpened(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation => h.location.inputFiles.length
            case _ => 0
          }
      }.sum

    val t = java.nio.file.Files.createTempDirectory("graft_scanstats")
      .toString + "/t"
    TableLog.create(spark, t,
      spark.range(n).select(col("id").as("k"), (col("id") % 97).as("v"))
        .repartitionByRange(files, col("k")),
      statsCols = Seq("k"))
    val lo = n / 2; val hi = n / 2 + n / files // ~1-2 files wide

    // warm the reader path once
    TableLog.read(spark, t).where(col("k").between(lo, hi)).count()

    val declarative = TableLog.scan(spark, t).where(col("k").between(lo, hi))
    val (cDecl, sDecl) = timed(declarative.count())
    val (cHand, sHand) = timed(
      TableLog.readWhere(spark, t, "k", lo, hi).count())
    val (cFull, sFull) = timed(
      TableLog.read(spark, t).where(col("k").between(lo, hi)).count())
    assert(cDecl == cHand && cHand == cFull,
      s"face disagreement: $cDecl/$cHand/$cFull")

    val dim = spark.range(5).select((col("id") * (n / 7) + 3).as("k"))
    def join(): DataFrame = TableLog.scan(spark, t).join(dim, Seq("k"))
    def planThenRun(): (Int, Double, Long, Double) = {
      val df = join()
      val (fo, sPlan) = timed(filesOpened(df))
      val (c, sRun) = timed(df.count())
      (fo, sPlan, c, sRun)
    }
    // alternate on/off twice and keep per-mode minima — first-run JIT
    // warmth otherwise biases whichever mode goes first
    def withDyn[A](on: Boolean)(f: => A): A = {
      spark.conf.set(graft.plans.PruneLogScan.DYN_KEY, on.toString)
      try f finally spark.conf.unset(graft.plans.PruneLogScan.DYN_KEY)
    }
    val onRuns = Seq.fill(2)(withDyn(true)(planThenRun()))
    val offRuns = Seq.fill(2)(withDyn(false)(planThenRun()))
    val (fOn, pOn, cOn, sOn) = (onRuns.head._1, onRuns.map(_._2).min,
      onRuns.head._3, onRuns.map(_._4).min)
    val (fOff, pOff, cOff, sOff) = (offRuns.head._1, offRuns.map(_._2).min,
      offRuns.head._3, offRuns.map(_._4).min)
    assert(cOn == cOff, s"dyn prune changed the join: $cOn vs $cOff")

    println(s"""{"metric":"scan_vs_eager","rows":$n,"files":$files,""" +
      s""""range_files_declarative":${filesOpened(declarative)},""" +
      s""""range_declarative_s":$sDecl,"range_readwhere_s":$sHand,""" +
      s""""range_fullscan_s":$sFull,""" +
      s""""join_files_dyn_on":$fOn,"join_files_dyn_off":$fOff,""" +
      s""""join_plan_dyn_on_s":$pOn,"join_plan_dyn_off_s":$pOff,""" +
      s""""join_run_dyn_on_s":$sOn,"join_run_dyn_off_s":$sOff}""")
    spark.stop()
  }
}
