package graft.tools

import graft.sinks.TableLog
import org.apache.spark.sql.SparkSession

/** Measurement: commit latency of a MULTI-THOUSAND-file append under
  * the two per-file row-count strategies — driver footer reads
  * (16-thread pool; the historical path) vs the distributed count
  * riding the stats aggregate (the path past `footerCountThreshold`).
  * Local NVMe floors the footer cost (~50 µs/footer vs ~10-50 ms on
  * an object store), so the distributed path's win here is a LOWER
  * BOUND on the object-store win.
  *
  *   sbt "runMain graft.tools.CommitStats [nFiles]"
  */
object CommitStats {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(3000)
    val spark = graft.SessionProfile.tune(SparkSession.builder())
      .master("local[32]").appName("commit-stats")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = spark.range(nFiles.toLong * 200)
      .select($"id".as("k"), ($"id" % 97).as("v"))
      .repartition(nFiles)
    df.cache().count()
    def run(label: String, threshold: Int): Long = {
      val saved = TableLog.footerCountThreshold
      TableLog.footerCountThreshold = threshold
      val t = java.nio.file.Files
        .createTempDirectory(s"graft_commit_$label").toString + "/t"
      try {
        val t0 = System.nanoTime()
        TableLog.create(spark, t, df, statsCols = Seq("k"))
        val ms = (System.nanoTime() - t0) / 1000000
        val snap = TableLog.snapshot(t).get
        require(snap.files.size == nFiles && snap.rows == nFiles * 200L,
          s"$label: ${snap.files.size} files / ${snap.rows} rows")
        ms
      } finally TableLog.footerCountThreshold = saved
    }
    run("warm", Int.MaxValue) // JIT + page-cache warm
    val footer = run("footer", Int.MaxValue)
    val dist = run("dist", 0)
    println(s"""{"n_files":$nFiles,"footer_ms":$footer,""" +
      s""""distributed_ms":$dist,"ratio":${"%.3f".format(
        dist.toDouble / footer)}}""")
    spark.stop()
  }
}
