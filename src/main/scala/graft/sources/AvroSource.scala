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

  /** Spark → Avro schema: primitives (long/int/double/float/string/
    * boolean/binary) plus NESTED composites — `ARRAY<T>` for any
    * supported T (including ARRAY<ARRAY<primitive>>) and STRUCT fields
    * (named sub-records, name derived from the field path) —
    * embeddings-in-Avro and nested multimodal metadata are the
    * training-data-lake cases a 100 TB corpus hits immediately. MAPs
    * are rejected descriptively (out of scope; model them as
    * ARRAY<STRUCT<key,value>>). Every nullable field (and nullable
    * array element / struct field) is a `[null, T]` union — Avro's
    * idiom. */
  def toAvroSchema(st: StructType, name: String = "GraftRecord"): Schema = {
    def nullable(s: Schema, isNullable: Boolean): Schema =
      if (isNullable) Schema.createUnion(List(Schema.create(Schema.Type.NULL), s).asJava)
      else s
    def convert(dt: DataType, where: String): Schema = dt match {
      case LongType    => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case ArrayType(et, containsNull) =>
        Schema.createArray(nullable(convert(et, s"$where element"), containsNull))
      case sub: StructType => record(sub, where.replaceAll("[^a-zA-Z0-9]", "_"))
      case _: MapType => throw new IllegalArgumentException(
        s"AvroSource does not support MAP columns ($where): model the map " +
          "as ARRAY<STRUCT<key, value>> — Avro maps force string keys and " +
          "lose key-type fidelity on the round trip")
      case other => throw new IllegalArgumentException(
        s"AvroSource supports primitive, array, and struct columns only, got $other for $where")
    }
    def record(s: StructType, recName: String): Schema = {
      val fields = s.fields.map { f =>
        new Schema.Field(f.name,
          nullable(convert(f.dataType, s"${recName}_${f.name}"), f.nullable),
          null, null)
      }
      Schema.createRecord(recName, null, "graft.avro", false,
        fields.toList.asJava)
    }
    record(st, name)
  }

  /** Non-null branch of a `[null, T]` union (or the schema itself). */
  private def nonNullOf(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** Schema-aware external-value → Avro-datum converter for one Spark
    * type: arrays recurse on the element, structs build the named
    * sub-record their Avro schema requires (a nested GenericData.Record
    * cannot be built without it — the reason the conversion is compiled
    * from the schema pair instead of pattern-matched on values). */
  private def toAvroFn(dt: DataType, avro: Schema): Any => Any = dt match {
    case BinaryType => v => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case ArrayType(et, _) =>
      val ec = toAvroFn(et, nonNullOf(nonNullOf(avro).getElementType))
      v => {
        val seq = v.asInstanceOf[scala.collection.Seq[_]]
        val out = new java.util.ArrayList[Any](seq.size)
        seq.foreach(e => out.add(if (e == null) null else ec(e)))
        out
      }
    case st: StructType =>
      val rs = nonNullOf(avro)
      val fcs = st.fields.zipWithIndex.map { case (f, i) =>
        toAvroFn(f.dataType, rs.getFields.get(i).schema())
      }
      v => {
        val r = v.asInstanceOf[org.apache.spark.sql.Row]
        val rec = new GenericData.Record(rs)
        var i = 0
        while (i < fcs.length) {
          rec.put(i, if (r.isNullAt(i)) null else fcs(i)(r.get(i)))
          i += 1
        }
        rec
      }
    case _ => identity
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
      // schema-aware converters compiled once per partition: nested
      // structs need their named Avro sub-schema to build sub-records
      val fieldFns = sparkSchema.fields.zipWithIndex.map { case (f, i) =>
        toAvroFn(f.dataType, schema.getFields.get(i).schema())
      }
      rows.map { r =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < n) {
          rec.put(i, if (r.isNullAt(i)) null else fieldFns(i)(r.get(i)))
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
        // AvroDsv2.toCatalyst turns it into Catalyst ArrayData. Nested
        // arrays recurse here with et itself an ArrayType/StructType.
        val out = new java.util.ArrayList[Any](l.size())
        l.asScala.foreach(e => out.add(convertValue(e, name, et)))
        out
      case (r: GenericRecord, st: StructType) =>
        // sub-record → external Row, fields matched BY NAME against the
        // record (order drift tolerated; missing field → null — the same
        // schema-evolution contract as top-level fields)
        org.apache.spark.sql.Row.fromSeq(st.fields.toSeq.map { f =>
          val fld = r.getSchema.getField(f.name)
          if (fld == null) null
          else convertValue(r.get(fld.pos()), s"$name.${f.name}", f.dataType)
        })
      case (other, _) => throw new IllegalArgumentException(
        s"Avro field '$name': file value is ${other.getClass.getName}, " +
          s"requested Spark type is $dt — no lossless widening path")
    }

  /** Read Avro container files at `path` into a DataFrame with the given
    * schema (primitives, arrays — nested included — and structs; maps
    * are rejected at write time). Fields are matched by NAME against the
    * record, so field-order drift between writer and reader schemas is
    * tolerated; a field missing from the file reads as null. Delegates to
    * the DataSource V2 table, so downstream projections prune into the
    * Avro decoder. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.format(classOf[AvroTableProvider].getName)
      .schema(schema).load(path)
}
