package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.col

/** Empirical probe of which parquet read-time type widenings this Spark
  * build supports (vectorized reader): write a file with the narrow
  * type, read under the wide schema, report OK/FAIL per pair. Feeds the
  * widening lattice in TableLog.mergeEvolved — only pairs that print OK
  * here may appear there. */
object WidenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    import spark.implicits._
    val base = "/tmp/widen_probe"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val cases: Seq[(String, DataType, DataType)] = Seq(
      ("byte_short", ByteType, ShortType),
      ("byte_int", ByteType, IntegerType),
      ("byte_long", ByteType, LongType),
      ("short_int", ShortType, IntegerType),
      ("short_long", ShortType, LongType),
      ("int_long", IntegerType, LongType),
      ("int_double", IntegerType, DoubleType),
      ("float_double", FloatType, DoubleType),
      ("long_double", LongType, DoubleType), // lossy >2^53 — expect refusal
      ("int_decimal", IntegerType, DecimalType(20, 0)))
    cases.foreach { case (name, narrow, wide) =>
      val dir = s"$base/$name"
      try {
        Seq(1, 2, 127).toDF("v").select(col("v").cast(narrow).as("v"))
          .write.parquet(dir)
        val out = spark.read.schema(StructType(Seq(StructField("v", wide))))
          .parquet(dir).collect().map(_.get(0)).toList
        println(s"PROBE $name OK $out")
      } catch {
        case e: Throwable =>
          println(s"PROBE $name FAIL ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
