package graft

import graft.sources.AvroSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** AvroSource contracts beyond the oracled round-trip (o26): null unions,
  * by-name field resolution under reader/writer schema drift, and the
  * split-read path producing exactly the written rows. */
class AvroSourceSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/data"

  test("nullable unions round-trip nulls and every primitive type") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = true),
      StructField("blob", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1L, "a", 1.5, true, Array[Byte](1, 2)),
      Row(2L, null, null, null, null),
      Row(3L, "c", -0.25, false, Array[Byte]()))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
    val path = tmp("graft_avro_null")
    AvroSource.write(df, path)
    val back = AvroSource.read(spark, path, schema)
      .collect().sortBy(_.getLong(0))
    assert(back.length == 3)
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) && back(1).isNullAt(3))
    assert(back(0).getString(1) == "a" && back(0).getDouble(2) == 1.5)
    assert(back(0).getAs[Array[Byte]](4).toSeq == Seq[Byte](1, 2))
    assert(back(2).getAs[Array[Byte]](4).isEmpty)
  }

  test("reader schema drift: reordered and missing fields resolve by name") {
    val writerSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, "x", 2.0), Row(2L, "y", 3.0)).toSeq, 1), writerSchema)
    val path = tmp("graft_avro_drift")
    AvroSource.write(df, path)
    // reordered + a field the file never had → matched by NAME, absent
    // field reads as null (the schema-evolution contract the scaladoc
    // promises)
    val readerSchema = StructType(Seq(
      StructField("score", DoubleType, nullable = true),
      StructField("added_later", StringType, nullable = true),
      StructField("id", LongType, nullable = false)))
    val back = AvroSource.read(spark, path, readerSchema)
      .collect().sortBy(_.getLong(2))
    assert(back.map(r => (r.getDouble(0), r.getLong(2))).toSeq ==
      Seq((2.0, 1L), (3.0, 2L)))
    assert(back.forall(_.isNullAt(1)))
  }

  test("primitive drift widens losslessly; real mismatches name the field") {
    val writerSchema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("score", FloatType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(7, 1.5f), Row(8, null)).toSeq, 1), writerSchema)
    val path = tmp("graft_avro_widen")
    AvroSource.write(df, path)
    // file has int/float; reader asks long/double → widened, not a crash
    val wide = AvroSource.read(spark, path, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = true))))
      .collect().sortBy(_.getLong(0))
    assert(wide.map(_.getLong(0)).toSeq == Seq(7L, 8L))
    assert(wide(0).getDouble(1) == 1.5 && wide(1).isNullAt(1))
    // long → int is lossy: the error must name the field and both types
    val ex = intercept[Exception] {
      AvroSource.read(spark, path, StructType(Seq(
        StructField("id", IntegerType, nullable = false),
        StructField("score", StringType, nullable = true))))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(m => m.contains("'score'") && m.contains("StringType")),
      s"expected a descriptive drift error, got $ex")
  }

  test("multi-partition write fans out files; read returns the union") {
    import spark.implicits._
    val df = spark.range(1000).select($"id", ($"id" % 7).as("m"))
    val path = tmp("graft_avro_parts")
    AvroSource.write(df.repartition(8), path)
    val files = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".avro"))
    assert(files == 8, s"one container file per task, got $files")
    val back = AvroSource.read(spark, path,
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("m", LongType, nullable = false))))
    assert(back.count() == 1000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == (0L until 1000L).sum)
  }

  test("column pruning reaches the Avro scan (2-of-N read schema)") {
    import spark.implicits._
    val df = spark.range(500).select($"id",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("wide-payload-"), $"id").as("text"),
      ($"id" % 3).as("m"), ($"id" * 2).as("v"))
    val path = tmp("graft_avro_prune")
    AvroSource.write(df, path)
    val full = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("m", LongType, nullable = false),
      StructField("v", LongType, nullable = false)))
    val pruned = AvroSource.read(spark, path, full).select("m", "v")
    // the DSv2 scan's read schema is the pruned 2-column struct — the
    // projection became the Avro reader schema, so `id`/`text` bytes are
    // skipped by the resolving decoder, not decoded and dropped
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, pruned.queryExecution.executedPlan.toString)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("m", "v"),
      scans.head.scan.readSchema().toString)
    // and values survive the projection
    assert(pruned.agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0)
      == (0L until 500L).map(_ * 2).sum)
  }

  test("pushed filters skip records before row materialization; results stay exact") {
    import spark.implicits._
    val df = spark.range(1000).select($"id",
      org.apache.spark.sql.functions.when($"id" % 10 === 0, null)
        .otherwise(org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("t"), $"id")).as("tag"))
    val path = tmp("graft_avro_filter")
    AvroSource.write(df, path)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tag", StringType, nullable = true)))
    val read = AvroSource.read(spark, path, schema)
    val q = read.where($"id" >= 100 && $"id" < 200 && $"tag".isNotNull)
    // the scan advertises the pushed predicates...
    val scans = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    val desc = scans.head.scan.description()
    assert(desc.contains("PushedFilters") && desc.contains("GreaterThanOrEqual(id,100)"),
      desc)
    // ...and the result is exactly the residual-checked answer
    assert(q.count() == 90)
    assert(q.agg(org.apache.spark.sql.functions.min("id")).head.getLong(0) == 101)
    // null-semantics: IsNull pushdown keeps exactly the null-tag rows
    assert(read.where($"tag".isNull).count() == 100)
  }

  test("ARRAY<FLOAT> round-trips through write and the pruning DSv2 read") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("label", StringType, nullable = true),
      StructField("embedding", ArrayType(FloatType, containsNull = true),
        nullable = true)))
    val rows = Seq(
      Row(0L, "a", Seq(1.5f, -2.25f, 0f)),
      Row(1L, "b", null), // null array
      Row(2L, "c", Seq(0.125f, null, 3f)), // null element
      Row(3L, "d", Seq.empty[Float]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
    val path = tmp("graft_avro_array")
    AvroSource.write(df, path)
    // inferSchema sees the array type back
    val inferred = graft.sources.AvroDsv2.inferSchema(spark, path)
    assert(inferred("embedding").dataType ==
      ArrayType(FloatType, containsNull = true), inferred.treeString)
    // project AWAY the label: the reader schema must prune to 2 columns
    // with the array column present
    val pruned = AvroSource.read(spark, path, schema)
      .select("vec_id", "embedding")
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.head.scan.readSchema().fieldNames.toSeq ==
      Seq("vec_id", "embedding"), scans.head.scan.readSchema().toString)
    val back = pruned.collect().sortBy(_.getLong(0))
    assert(back(0).getSeq[Float](1) == Seq(1.5f, -2.25f, 0f))
    assert(back(1).isNullAt(1))
    assert(back(2).getSeq[java.lang.Float](1) ==
      Seq(java.lang.Float.valueOf(0.125f), null, java.lang.Float.valueOf(3f)))
    assert(back(3).getSeq[Float](1).isEmpty)
    // MAP columns stay rejected with a descriptive error naming the field
    val ex = intercept[IllegalArgumentException] {
      AvroSource.toAvroSchema(StructType(Seq(StructField("bad",
        MapType(StringType, LongType)))))
    }
    assert(ex.getMessage.contains("bad") && ex.getMessage.contains("MAP"))
  }

  test("nested ARRAY<ARRAY> and STRUCT round-trip with pruning intact") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", StringType, nullable = true), // must prune away
      StructField("meta", StructType(Seq(
        StructField("lang", StringType, nullable = true),
        StructField("score", LongType, nullable = true))), nullable = true),
      StructField("grid", ArrayType(
        ArrayType(LongType, containsNull = true), containsNull = true),
        nullable = true)))
    val rows = Seq(
      Row(0L, "fat-0", Row("en", 7L), Seq(Seq(1L, 2L), Seq(3L))),
      Row(1L, "fat-1", null, null),                    // null struct + array
      Row(2L, "fat-2", Row(null, 9L), Seq(null, Seq(4L, null))), // null inner
      Row(3L, "fat-3", Row("de", null), Seq(Seq.empty[Long])))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
    val path = tmp("graft_avro_nested")
    AvroSource.write(df, path)
    // inference recovers both nested shapes
    val inferred = graft.sources.AvroDsv2.inferSchema(spark, path)
    assert(inferred("grid").dataType ==
      ArrayType(ArrayType(LongType, containsNull = true), containsNull = true),
      inferred.treeString)
    assert(inferred("meta").dataType.isInstanceOf[StructType], inferred.treeString)
    // project AWAY the fat payload: reader schema prunes to 3 columns with
    // the nested columns intact
    val pruned = AvroSource.read(spark, path, schema)
      .select("id", "meta", "grid")
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.head.scan.readSchema().fieldNames.toSeq ==
      Seq("id", "meta", "grid"), scans.head.scan.readSchema().toString)
    val back = pruned.collect().sortBy(_.getLong(0))
    assert(back(0).getStruct(1).getString(0) == "en")
    assert(back(0).getStruct(1).getLong(1) == 7L)
    assert(back(0).getSeq[Seq[Long]](2) == Seq(Seq(1L, 2L), Seq(3L)))
    assert(back(1).isNullAt(1) && back(1).isNullAt(2))
    assert(back(2).getStruct(1).isNullAt(0))
    assert(back(2).getSeq[Seq[java.lang.Long]](2) ==
      Seq(null, Seq(java.lang.Long.valueOf(4L), null)))
    assert(back(3).getStruct(1).isNullAt(1))
    assert(back(3).getSeq[Seq[Long]](2) == Seq(Seq.empty[Long]))
  }

  test("one large container file splits into multiple sync-aligned slices") {
    import spark.implicits._
    val df = spark.range(200000).select($"id",
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("padding-padding-padding-"),
        $"id").as("text"))
      .coalesce(1)
    val path = tmp("graft_avro_split")
    AvroSource.write(df, path)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "262144") // 256 KB
      val back = AvroSource.read(spark, path, StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("text", StringType, nullable = true))))
      assert(back.rdd.getNumPartitions > 4,
        s"expected >4 splits of one file, got ${back.rdd.getNumPartitions}")
      assert(back.count() == 200000) // no record lost or doubled at split edges
      assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
        == (0L until 200000L).sum)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
