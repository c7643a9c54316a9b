package graft.cli

import graft.pipelines.Pipelines
import org.apache.spark.sql.SparkSession

/** CLI entry point — mode parity with the reference CLI
  * (cmd/cli/main.go:45-109; README.md:3-61):
  *
  *   convert-cna <datahubDir>
  *   convert-cna-with-derived <datahubDir>
  *   convert-mutations <datahubDir>
  *   combine-cna <dir> <outputBase>
  *   combine-cna-with-derived <dir> <outputBase>
  *   combine-mutations <dir> <outputBase>
  */
object Main {
  def main(args: Array[String]): Unit = {
    def usage(): Nothing = {
      System.err.println(
        "usage: graft.cli.Main <convert-cna|convert-cna-with-derived|convert-mutations> <datahubDir>\n" +
        "     | graft.cli.Main <combine-cna|combine-cna-with-derived|combine-mutations> <dir> <outputBase>")
      sys.exit(2)
    }
    if (args.length < 2) usage()
    // combine modes take a third positional (the output base name)
    if (args(0).startsWith("combine-") && args.length < 3) usage()
    val mode = args(0)
    val spark = graft.SessionProfile.tune(SparkSession.builder())
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName(s"graft-$mode")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    try {
      val written = mode match {
        case "convert-cna"              => Pipelines.convertCna(spark, args(1))
        case "convert-cna-with-derived" => Pipelines.convertCna(spark, args(1), withDerived = true)
        case "convert-mutations"        => Pipelines.convertMutations(spark, args(1))
        case "combine-cna" =>
          Pipelines.combine(spark, args(1), args(2), Pipelines.cnaSuffixes)
        case "combine-cna-with-derived" =>
          Pipelines.combine(spark, args(1), args(2), Pipelines.cnaDerivedSuffixes)
        case "combine-mutations" =>
          Pipelines.combine(spark, args(1), args(2), Pipelines.mutationSuffixes)
        case other =>
          System.err.println(s"unknown mode: $other")
          usage()
      }
      written.foreach(p => println(s"wrote: $p"))
      // total wall-clock log, like the reference (cmd/cli/main.go:76,107-108)
      println(f"Total execution time: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    } finally spark.stop()
  }
}
