package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sinks.TableLog

/** Read-cost-vs-pending-sidecar-count curve — the measurement behind
  * `morMaintain`'s default `maxSidecars = 8`. Builds an n-row
  * range-clustered table, applies scattered single-key MOR deletes one
  * at a time, and times a full-scan aggregate at sidecar counts
  * 0/2/4/8/16/32 (each delete lands at a distinct version, so each is
  * its own anti-join fence — the worst case `morScan` cohorts pay).
  * Then runs `morMaintain` and times the clean read back.
  *
  *   sbt "runMain graft.tools.MorMaintStats [n]"   (default n = 2000000)
  *
  * Prints one JSON line:
  *   {"n":…,"read_sec_by_sidecars":{"0":…,…},"maintain_sec":…,
  *    "post_maintain_read_sec":…,"files_rewritten":…,"files_total":…}
  */
object MorMaintStats {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionProfile.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val t = java.nio.file.Files.createTempDirectory("mormaint")
      .toString + "/t"
    TableLog.create(spark, t,
      spark.range(n).select($"id".as("k"), ($"id" % 97).as("v"))
        .repartitionByRange(32, $"k").sortWithinPartitions("k"),
      statsCols = Seq("k"))

    def timeRead(): Double = {
      val t0 = System.nanoTime()
      TableLog.read(spark, t).agg(sum($"v")).head.getLong(0)
      (System.nanoTime() - t0) / 1e9
    }
    // scattered keys: one per future sidecar, spread across the range
    // so every delete fences a DIFFERENT file region
    val checkAt = Seq(0, 2, 4, 8, 16, 32)
    val curve = scala.collection.mutable.LinkedHashMap[Int, Double]()
    var applied = 0
    timeRead() // warm
    for (target <- checkAt) {
      while (applied < target) {
        val key = (applied.toLong * 2654435761L) % n
        TableLog.deleteMor(spark, t, "k", Seq(key).toDF("k"))
        applied += 1
      }
      curve(target) = (0 until 3).map(_ => timeRead()).min
    }
    // NARROW scenario on a fresh twin: the same 32 single-key deletes
    // all inside ONE file's key range — morScan's tier-1 fence check
    // sends the other 31 files down the raw path with zero anti-joins,
    // so the read toll should stay near the clean-read floor however
    // many sidecars pend (the case that used to pay the full toll)
    val tn = java.nio.file.Files.createTempDirectory("mormaintN")
      .toString + "/t"
    TableLog.create(spark, tn,
      spark.range(n).select($"id".as("k"), ($"id" % 97).as("v"))
        .repartitionByRange(32, $"k").sortWithinPartitions("k"),
      statsCols = Seq("k"))
    def timeReadN(): Double = {
      val t0 = System.nanoTime()
      TableLog.read(spark, tn).agg(sum($"v")).head.getLong(0)
      (System.nanoTime() - t0) / 1e9
    }
    timeReadN() // warm
    val narrow = scala.collection.mutable.LinkedHashMap[Int, Double]()
    var appliedN = 0
    for (target <- checkAt) {
      while (appliedN < target) {
        val key = (appliedN.toLong * 131L) % (n / 32) // all in file 0
        TableLog.deleteMor(spark, tn, "k", Seq(key).toDF("k"))
        appliedN += 1
      }
      narrow(target) = (0 until 3).map(_ => timeReadN()).min
    }
    // folding the 32-sidecar burst into one key file removes the
    // per-sidecar file-open toll without touching a data file
    TableLog.morFold(spark, tn)
    val narrowFolded = (0 until 3).map(_ => timeReadN()).min
    val foldedCount = TableLog.snapshot(tn).get.dels.size

    val filesTotal = TableLog.snapshot(t).get.files.size
    val t0 = System.nanoTime()
    TableLog.morMaintain(spark, t, maxSidecars = 0, statsCols = Seq("k"))
    val maintainSec = (System.nanoTime() - t0) / 1e9
    val filesCarried = TableLog.snapshot(t).get.files.map(_.path).toSet
      .intersect(TableLog.snapshotAt(t, 1).get.files.map(_.path).toSet)
      .size
    val postSec = (0 until 3).map(_ => timeRead()).min
    println(s"""{"n":$n,"read_sec_by_sidecars":{${
      curve.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
        .mkString(",")}},"narrow_read_sec_by_sidecars":{${
      narrow.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
        .mkString(",")}},"narrow_folded_sidecars":$foldedCount,""" +
      s""""narrow_post_fold_read_sec":${f"$narrowFolded%.3f"},""" +
      s""""maintain_sec":${f"$maintainSec%.3f"},""" +
      s""""post_maintain_read_sec":${f"$postSec%.3f"},""" +
      s""""files_rewritten":${filesTotal - filesCarried},""" +
      s""""files_total":$filesTotal}""")
    spark.stop()
  }
}
