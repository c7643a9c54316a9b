package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sinks.TableLog

/** Commit-cost observability for TableLog's delta-manifest log: the
  * structural claim is that an append commits O(appended files) — a
  * delta manifest — not O(table files), with a full checkpoint only
  * every `checkpointInterval`-th version. This probe grows a table's
  * file count ~100× (10 → ~1000 files) and measures per-append commit
  * wall time and manifest bytes at both ends: under the old
  * full-snapshot-per-commit scheme the large-table append manifest
  * would be ~100× the small one (the checkpoint size reported below IS
  * that counterfactual); under the delta scheme the two are identical.
  *
  *   sbt "runMain graft.tools.LogStats"
  *
  * Prints one JSON line.
  */
object LogStats {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionProfile.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = java.nio.file.Files.createTempDirectory("graft_logstats")
      .toString + "/t"
    def manifest(v: Long) =
      java.nio.file.Paths.get(t, "_log", f"v$v%08d.manifest")
    def isDelta(v: Long) = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(manifest(v)).asScala
        .contains("kind=delta")
    }
    // one-file appends, timed; returns (sec, manifestBytes) for the
    // DELTA commits only (checkpoint versions are reported separately)
    def timedAppends(n: Int, from: Long): Seq[(Double, Long)] =
      (0 until n).flatMap { i =>
        val df = spark.range(from + i * 10, from + i * 10 + 10).toDF("id")
          .coalesce(1)
        val t0 = System.nanoTime()
        val v = TableLog.append(spark, t, df)
        val sec = (System.nanoTime() - t0) / 1e9
        if (isDelta(v)) Some((sec, java.nio.file.Files.size(manifest(v))))
        else None
      }
    TableLog.create(spark, t,
      spark.range(100).toDF("id").repartition(10))           // ~10 files
    val small = timedAppends(6, 1000000L)
    // bulk-grow to ~1000 files: 10 appends of 100 files each
    (0 until 10).foreach { i =>
      TableLog.append(spark, t,
        spark.range(i * 1000L, i * 1000L + 1000).toDF("id").repartition(100))
    }
    val filesNow = TableLog.snapshot(t).get.files.size
    val large = timedAppends(6, 2000000L)
    // the counterfactual: the latest checkpoint's size is what EVERY
    // commit would have written under full-snapshot manifests
    val latest = TableLog.latestVersion(t)
    val ckptBytes = (latest to 1L by -1L).find(v => !isDelta(v))
      .map(v => java.nio.file.Files.size(manifest(v))).getOrElse(0L)
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    // ---- txn-lookup cost on a DEEP commit history: grow a 10k-version
    // chain (metadata-only commits, 4 interleaved streams), then time
    // committedTxnVersion. The indexed path reads ONE manifest whether
    // the id hits the frontier or is provably new; the opaque-id
    // fallback scan below is the pre-index counterfactual — O(versions)
    // manifest parses per probe.
    val t2 = java.nio.file.Files.createTempDirectory("graft_logstats_txn")
      .toString + "/t"
    TableLog.create(spark, t2, spark.range(10).toDF("id").coalesce(1))
    val nCommits = 10000
    val tGrow0 = System.nanoTime()
    (0 until nCommits).foreach { i =>
      TableLog.commitMetadataOnly(t2, Some(s"stream${i % 4}#${i / 4}"))
    }
    val growSec = (System.nanoTime() - tGrow0) / 1e9
    val latestT2 = TableLog.latestVersion(t2)
    def timed(reps: Int)(f: => Unit): Double = {
      val t0 = System.nanoTime(); (0 until reps).foreach(_ => f)
      (System.nanoTime() - t0) / 1e9 / reps
    }
    val lastSeq = (nCommits - 1) / 4
    val hitSec = timed(100) {
      assert(TableLog.committedTxnVersion(t2, s"stream3#$lastSeq").nonEmpty)
    }
    val missSec = timed(100) {
      assert(TableLog.committedTxnVersion(t2,
        s"stream3#${lastSeq + 1}").isEmpty)
    }
    val scanSec = timed(3) {
      assert(TableLog.committedTxnVersion(t2, "opaque-never-committed")
        .isEmpty)
    }
    println(s"""{"small_files":10,"large_files":$filesNow,""" +
      s""""small_delta_sec":${f"${med(small.map(_._1))}%.3f"},""" +
      s""""large_delta_sec":${f"${med(large.map(_._1))}%.3f"},""" +
      s""""small_delta_bytes":${med(small.map(_._2.toDouble)).toLong},""" +
      s""""large_delta_bytes":${med(large.map(_._2.toDouble)).toLong},""" +
      s""""checkpoint_bytes":$ckptBytes,""" +
      s""""txn_history_versions":$latestT2,""" +
      s""""txn_grow_sec":${f"$growSec%.1f"},""" +
      s""""txn_lookup_hit_sec":${f"$hitSec%.6f"},""" +
      s""""txn_lookup_miss_sec":${f"$missSec%.6f"},""" +
      s""""txn_lookup_scan_fallback_sec":${f"$scanSec%.3f"}}""")
    spark.stop()
  }
}
