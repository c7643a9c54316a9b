package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Distributed Avro container-file source/sink built directly on the Avro
  * Hadoop MapReduce formats (`avro-mapred`), because this environment ships
  * the Avro core jars but not the `spark-avro` datasource module.
  *
  * The sink maps rows to `GenericRecord`s inside each task and writes
  * through `AvroKeyOutputFormat` (one container file per partition — the
  * same file-per-task layout the parquet sink produces). The read path is
  * a DataSource V2 table (`AvroTableProvider` in AvroDsv2.scala): column
  * pruning pushes into the Avro reader schema so unprojected fields are
  * byte-skipped by the resolving decoder, and each container file splits
  * into `maxPartitionBytes` sync-aligned slices, so one large file fans
  * out across tasks.
  *
  * Scale notes: no shuffle on either path; the write is task-local
  * append, the read a splittable, pruning scan. Pushed comparison
  * filters are evaluated on the decoded datum BEFORE row
  * materialization (misses never become rows); I/O-level skipping
  * still needs per-block column stats a row format doesn't carry —
  * that remains parquet's edge.
  *
  * Reference parity: the importer reads columnar inputs generically
  * (cna/reader_parquet.go:25-60); Avro is the row-major container format
  * counterpart in our format matrix (JSON/ORC/XML/Avro).
  */
object AvroSource {

  /** Spark → Avro schema for the engine's column subset: flat primitives
    * (long/int/double/float/string/boolean/binary) plus
    * `ARRAY<primitive>` — embeddings-in-Avro is the training-data-lake
    * case a 100 TB corpus hits immediately. Every nullable field (and
    * nullable array element) is a `[null, T]` union — Avro's idiom. */
  def toAvroSchema(st: StructType, name: String = "GraftRecord"): Schema = {
    def primitive(dt: DataType, where: String): Schema = dt match {
      case LongType    => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"AvroSource supports primitive and array<primitive> columns only, got $other for $where")
    }
    def nullable(s: Schema, isNullable: Boolean): Schema =
      if (isNullable) Schema.createUnion(List(Schema.create(Schema.Type.NULL), s).asJava)
      else s
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case ArrayType(et, containsNull) =>
          Schema.createArray(nullable(primitive(et, s"${f.name} element"), containsNull))
        case dt => primitive(dt, f.name)
      }
      new Schema.Field(f.name, nullable(base, f.nullable), null, null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  /** Write `df` as Avro container files under `path` (overwrite). */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    if (fs.exists(p)) fs.delete(p, true)

    val sparkSchema = df.schema
    val avroJson = toAvroSchema(sparkSchema).toString // Schema isn't serializable; ship JSON
    val job = Job.getInstance(hconf)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(avroJson))

    val pairs = df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(avroJson)
      val n = sparkSchema.length
      def toAvro(v: Any): Any = v match {
        case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
        case seq: scala.collection.Seq[_] => // ArrayType column
          seq.map(toAvro).asJava
        case other => other // primitives/strings pass through; null stays null
      }
      rows.map { r =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < n) {
          rec.put(i, toAvro(r.get(i)))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get)
      }
    }
    pairs.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Avro datum → Spark value for one field. Exact-type values pass
    * through; writer/reader primitive drift widens where lossless
    * (int→long, int/long/float→double, float stays exact in double);
    * anything else fails HERE with the field name and both types, instead
    * of surfacing later as an opaque RowEncoder failure. */
  private[sources] def convertValue(raw: Any, name: String, dt: DataType): Any =
    (raw, dt) match {
      case (null, _)                                  => null
      case (u: org.apache.avro.util.Utf8, StringType) => u.toString
      case (s: CharSequence, StringType)              => s.toString
      case (bb: java.nio.ByteBuffer, BinaryType) =>
        val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
      case (v: java.lang.Integer, IntegerType)        => v
      case (v: java.lang.Integer, LongType)           => v.longValue()
      case (v: java.lang.Integer, DoubleType)         => v.doubleValue()
      case (v: java.lang.Long, LongType)              => v
      case (v: java.lang.Long, DoubleType)            => v.doubleValue()
      case (v: java.lang.Float, FloatType)            => v
      case (v: java.lang.Float, DoubleType)           => v.doubleValue()
      case (v: java.lang.Double, DoubleType)          => v
      case (v: java.lang.Boolean, BooleanType)        => v
      case (l: java.util.Collection[_], ArrayType(et, _)) =>
        // GenericData.Array (or any list) → element-converted java List;
        // AvroDsv2.toCatalyst turns it into Catalyst ArrayData
        val out = new java.util.ArrayList[Any](l.size())
        l.asScala.foreach(e => out.add(convertValue(e, name, et)))
        out
      case (other, _) => throw new IllegalArgumentException(
        s"Avro field '$name': file value is ${other.getClass.getName}, " +
          s"requested Spark type is $dt — no lossless widening path")
    }

  /** Read Avro container files at `path` into a DataFrame with the given
    * (flat primitive) schema. Fields are matched by NAME against the
    * record, so field-order drift between writer and reader schemas is
    * tolerated; a field missing from the file reads as null. Delegates to
    * the DataSource V2 table, so downstream projections prune into the
    * Avro decoder. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.format(classOf[AvroTableProvider].getName)
      .schema(schema).load(path)
}
