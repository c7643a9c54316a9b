package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a list of registry queries to
  * files — the plan evidence the optimization rounds commit under
  * plans/<round>/ (guide §1: capture the plan before and after).
  *
  *   sbt "runMain graft.tools.ExplainDump <outDir> <sfDir> <q1> <q2> ..."
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val sfDir = args(1)
    val names = args.drop(2)
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionProfile.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(s"$n.txt"), plan)
      println(s"[explaindump] wrote ${outDir.resolve(s"$n.txt")}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
