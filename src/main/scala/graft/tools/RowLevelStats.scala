package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sinks.TableLog

/** Catalog row-level MERGE observability: quantifies the runtime
  * group filter (`RowLevelOperationRuntimeGroupFiltering` over
  * `GraftRowLevelScan.filter`) that the nondeterministic
  * `input_file_name()` in the read path used to get stripped by
  * `CleanupDynamicPruningFilters` (see `TableLog.attachMeta`). Builds
  * one catalog table of `files` range-clustered files × `rowsPerFile`
  * rows, then commits:
  *
  *   1. a ONE-KEY canonical MERGE (matched update + not-matched
  *      insert) — with the group filter alive this rewrites exactly
  *      the files holding the key; without it, the whole table;
  *   2. the same source with a `WHEN NOT MATCHED BY SOURCE` clause —
  *      every target row is a candidate by SEMANTICS, so this is the
  *      legitimate full rewrite that calibrates what (1) avoided.
  *
  * Rewritten-file counts are read back from the commits' manifests
  * (removed = previous ∖ next), so the claim is pinned by the log,
  * not the stopwatch.
  *
  *   sbt "runMain graft.tools.RowLevelStats [files] [rowsPerFile]"
  *   (defaults: 64 files × 200000 rows)
  *
  * Prints one JSON line.
  */
object RowLevelStats {
  def main(args: Array[String]): Unit = {
    val files = args.lift(0).map(_.toInt).getOrElse(64)
    val rowsPerFile = args.lift(1).map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionProfile.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val wh = java.nio.file.Files
      .createTempDirectory("graft_rlstats_wh").toString
    val cat = "graft_rls"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    graft.plans.ResolveGraftCatalogReads.install(spark)
    spark.sql(s"CREATE NAMESPACE $cat.rls")
    spark.sql(s"CREATE TABLE $cat.rls.t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('statsCols' = 'k')")
    val path = s"$wh/rls/t"
    val n = files * rowsPerFile
    TableLog.append(spark,
      path,
      spark.range(n).select($"id".as("k"), ($"id" % 97).as("v"))
        .repartitionByRange(files, $"k"),
      statsCols = Seq("k"))
    val v0 = TableLog.snapshot(path).get
    require(v0.files.size == files, s"wanted $files files, got ${v0.files.size}")

    def removedBy(prev: TableLog.Snapshot): (Int, TableLog.Snapshot) = {
      val cur = TableLog.snapshot(path).get
      (prev.files.map(_.path).toSet
        .diff(cur.files.map(_.path).toSet).size, cur)
    }

    // (1) one-key canonical merge: the key lives in exactly one file
    Seq((n / 2, -1L), (n + 5, -2L)).toDF("k", "v")
      .createOrReplaceTempView("rls_src")
    val (_, t1) = timed(spark.sql(
      s"""MERGE INTO $cat.rls.t t USING rls_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""))
    val (rw1, v1) = removedBy(v0)

    // (2) the same source + a by-source clause: full candidate set
    val (_, t2) = timed(spark.sql(
      s"""MERGE INTO $cat.rls.t t USING rls_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = v + 0"""))
    val (rw2, _) = removedBy(v1)

    println(s"""{"tool":"RowLevelStats","files":$files""" +
      s""","rows":$n,"canonical_rewritten_files":$rw1""" +
      s""","canonical_sec":${f"$t1%.3f"}""" +
      s""","by_source_rewritten_files":$rw2""" +
      s""","by_source_sec":${f"$t2%.3f"}}""")
    spark.stop()
  }
}
