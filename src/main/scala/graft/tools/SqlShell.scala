package graft.tools

import graft.GraftFunctions
import org.apache.spark.sql.SparkSession

/** Dev tool: run one SQL statement with the graft SQL functions registered
  * and the driver test tables mounted as views.
  *
  *   sbt "runMain graft.tools.SqlShell \"SELECT dot_long(array(1L),array(2L))\" [sfDir]"
  */
object SqlShell {
  def main(args: Array[String]): Unit = {
    val sql = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.SessionProfile.tune(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    spark.sql(sql).show(50, truncate = false)
    spark.stop()
  }
}
