package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of a registry query and time
  * two executions (cold + warm).
  *
  *   sbt "runMain graft.tools.Explain e2_minhash_pairs [/root/testdata/sf0.1]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = name match {
      // dev probes for sub-stages not in the registry
      case "dev:minhash_bands" =>
        graft.operators.DedupOps.minhashBands(
          spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", 4)
      case _ => SparkEntry.queries(name)(spark, sfDir)
    }
    df.explain("formatted")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[explain] run$i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
