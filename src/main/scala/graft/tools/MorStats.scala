package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sinks.TableLog

/** Merge-on-read delete observability: measures `TableLog.deleteMor`
  * (key sidecar, ZERO data-file rewrites) against a copy-on-write
  * delete of the same keys (full anti-join rewrite — on an UNCLUSTERED
  * table every file's key range spans the domain, so COW cannot prune)
  * at n and 10n rows. The scale claim is that the MOR commit tracks the
  * DELETED KEYS (~flat as the table grows) while COW tracks TABLE size
  * (~linear); rewritten-file counts are read back from the commits'
  * manifests, so the claim is pinned by the log, not the stopwatch.
  * Also reports the read-side toll: a pending-sidecar scan vs a clean
  * scan of the same table (the price paid until `compact()` lazily
  * materializes the sidecar away).
  *
  *   sbt "runMain graft.tools.MorStats [n]"      (default n = 500000)
  *
  * Prints one JSON line.
  */
object MorStats {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(500000L)
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
    // deleted-key shape fixed across scales: 1000 keys scattered
    // uniformly over the WHOLE domain — the GDPR/"retract these docs"
    // shape that defeats range pruning on an unclustered layout
    def keysFor(rows: Long) = spark.range(1000)
      .select((col("id") * (rows / 1000) + 7).as("k"))

    def mkTable(rows: Long, files: Int): String = {
      val t = java.nio.file.Files.createTempDirectory("graft_morstats")
        .toString + "/t"
      // hash-partitioned on a NON-key column: every file's k range is
      // [~0, ~rows] — the worst case for stats-pruned COW
      TableLog.create(spark, t,
        spark.range(rows).select(col("id").as("k"), (col("id") % 97).as("v"))
          .repartition(files, col("v")),
        statsCols = Seq("k"))
      t
    }

    def runAt(rows: Long, files: Int): Map[String, Double] = {
      val tMor = mkTable(rows, files)
      val tCow = mkTable(rows, files)
      val keys = keysFor(rows)
      val expect = rows - 1000L
      val beforeMor = TableLog.snapshot(tMor).get.files.map(_.path).toSet
      val (_, sMor) = timed {
        TableLog.deleteMor(spark, tMor, "k", keys)
      }
      val afterMor = TableLog.snapshot(tMor).get
      val morRewritten =
        beforeMor.size - afterMor.files.map(_.path).count(beforeMor)
      val beforeCow = TableLog.snapshot(tCow).get.files.map(_.path).toSet
      val (_, sCow) = timed {
        TableLog.rewrite(spark, tCow, "delete",
            expectRows = _ => Some(expect)) { df =>
          df.join(keys, Seq("k"), "left_anti")
        }
      }
      val afterCow = TableLog.snapshot(tCow).get
      val cowRewritten =
        beforeCow.size - afterCow.files.map(_.path).count(beforeCow)
      assert(afterMor.rows == expect, s"mor rows ${afterMor.rows}")
      assert(afterCow.rows == expect, s"cow rows ${afterCow.rows}")
      // decisions identical: both paths read back the same relation
      val diff = TableLog.read(spark, tMor)
        .exceptAll(TableLog.read(spark, tCow)).count()
      assert(diff == 0, s"mor vs cow read differ by $diff rows")
      // read-side toll of the pending sidecar vs the clean COW table
      val (_, sReadMor) = timed(TableLog.read(spark, tMor).count())
      val (_, sReadClean) = timed(TableLog.read(spark, tCow).count())
      Map("rows" -> rows.toDouble, "files" -> files.toDouble,
        "mor_s" -> sMor, "cow_s" -> sCow,
        "mor_rewritten_files" -> morRewritten.toDouble,
        "cow_rewritten_files" -> cowRewritten.toDouble,
        "read_mor_s" -> sReadMor, "read_clean_s" -> sReadClean)
    }

    val small = runAt(n, 16)
    val big = runAt(n * 10, 160)
    def j(m: Map[String, Double]) = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"mor_vs_cow_delete","small":${j(small)},""" +
      s""""big":${j(big)},""" +
      s""""mor_ratio":${big("mor_s") / small("mor_s")},""" +
      s""""cow_ratio":${big("cow_s") / small("cow_s")}}""")
    spark.stop()
  }
}
