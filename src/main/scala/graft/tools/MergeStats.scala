package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sinks.TableLog

/** Copy-on-write merge observability: measures `TableLog.mergeCow`
  * (stats-pruned delta — rewrite only key-overlapping files) against
  * `TableLog.mergeUpsert` (full-snapshot rewrite) for the SAME
  * fixed-width source applied to a range-clustered table at n and 10n
  * rows. The scale claim is that mergeCow's cost tracks AFFECTED FILES
  * (~flat as the table grows — the source's key band covers a shrinking
  * fraction) while the full rewrite tracks TABLE size (~linear); the
  * rewritten-file counts are read back from the commit's own delta
  * manifest, so the claim is pinned by the log, not the stopwatch.
  *
  *   sbt "runMain graft.tools.MergeStats [n]"      (default n = 200000)
  *
  * Prints one JSON line.
  */
object MergeStats {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(200000L)
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
    // source shape fixed across scales: a 1k-key update band at the low
    // end of the domain plus 100 inserts past every key — the "day's
    // corrections" shape against a growing lake
    def sourceFor(rows: Long) = spark.range(1000)
      .select(col("id").as("k"), lit(-1L).as("v"))
      .unionByName(spark.range(rows + 1, rows + 101)
        .select(col("id").as("k"), lit(-2L).as("v")))

    def mkTable(rows: Long, files: Int): String = {
      val t = java.nio.file.Files.createTempDirectory("graft_mergestats")
        .toString + "/t"
      TableLog.create(spark, t,
        spark.range(rows).select(col("id").as("k"), (col("id") * 3).as("v"))
          .repartitionByRange(files, col("k"))
          .sortWithinPartitions("k"),
        statsCols = Seq("k"))
      t
    }

    def runAt(rows: Long, files: Int): Map[String, Double] = {
      // fresh twin tables per scale: each path merges into its own
      val tCow = mkTable(rows, files)
      val tFull = mkTable(rows, files)
      val src = sourceFor(rows)
      val beforeFiles = TableLog.snapshot(tCow).get.files.map(_.path).toSet
      val (_, sCow) = timed {
        TableLog.mergeCow(spark, tCow, src, "k", statsCols = Seq("k"))
        TableLog.read(spark, tCow).count()
      }
      val afterCow = TableLog.snapshot(tCow).get
      val carried = afterCow.files.map(_.path).count(beforeFiles)
      val rewritten = beforeFiles.size - carried
      val (_, sFull) = timed {
        TableLog.mergeUpsert(spark, tFull, src, Seq("k"))
        TableLog.read(spark, tFull).count()
      }
      assert(afterCow.rows == rows + 100, s"cow rows ${afterCow.rows}")
      assert(TableLog.snapshot(tFull).get.rows == rows + 100)
      // decisions identical: both paths produce the same merged relation
      val diff = TableLog.read(spark, tCow)
        .exceptAll(TableLog.read(spark, tFull)).count()
      assert(diff == 0, s"cow vs full rewrite differ by $diff rows")
      Map("rows" -> rows.toDouble, "files" -> files.toDouble,
        "cow_s" -> sCow, "full_s" -> sFull,
        "rewritten_files" -> rewritten.toDouble,
        "carried_files" -> carried.toDouble)
    }

    val small = runAt(n, 16)
    val big = runAt(n * 10, 160)
    def j(m: Map[String, Double]) = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"merge_cow_vs_full","small":${j(small)},""" +
      s""""big":${j(big)},""" +
      s""""cow_ratio":${big("cow_s") / small("cow_s")},""" +
      s""""full_ratio":${big("full_s") / small("full_s")}}""")
    spark.stop()
  }
}
