package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 read path for Avro container files, replacing the
  * RDD-backed scan that could neither prune columns nor split cleanly
  * into Catalyst's planning (sources/AvroSource.scala keeps the write
  * path and the per-datum conversion).
  *
  * Column pruning is REAL here, not cosmetic: the pruned schema becomes
  * the Avro *reader schema* (a projection of the writer record), and
  * Avro's schema-resolution decoder then SKIPS the bytes of every
  * unprojected field instead of decoding and allocating them. A row
  * format can't skip I/O the way parquet skips column chunks, but at
  * 100 TB skipping the decode/alloc of a fat `text` column when the
  * query touches two small fields is the difference that matters on a
  * scan-bound job.
  *
  * Scale shape: one InputPartition per `maxPartitionBytes` slice of each
  * container file (sync-marker aligned, the standard Avro split
  * protocol: seek to the first sync after `start`, read until past the
  * first sync after `end`) — a single large file fans out across the
  * cluster exactly like the Hadoop-format path did.
  */
final class AvroTableProvider extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = AvroDsv2.pathFrom(options.asScala.toMap)
    AvroDsv2.inferSchema(SparkSession.active, path)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new AvroTable(schema, AvroDsv2.pathFrom(properties.asScala.toMap))
}

final class AvroTable(schema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-avro:$path"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(schema, path)
}

final class AvroScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = fullSchema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Supported comparisons are evaluated on the decoded datum BEFORE the
    * InternalRow is built (skips row materialization for misses — the
    * scan-time saving a row format can offer; I/O-level skipping needs
    * column stats Avro doesn't carry). EVERY filter is also returned as
    * residual, so Spark re-applies them and a partially-evaluated
    * conjunction can never drop or leak rows. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(AvroDsv2.evaluable)
    filters // all residual: Spark keeps correctness, we keep the fast skip
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushed
  override def build(): Scan = AvroScan(required, path, pushed.toSeq)
}

final case class AvroScan(required: StructType, path: String,
    pushed: Seq[org.apache.spark.sql.sources.Filter] = Nil)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro $path ReadSchema: ${required.catalogString}" +
      s" PushedFilters: ${pushed.mkString("[", ", ", "]")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sparkContext.hadoopConfiguration
    val maxBytes = JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    AvroDsv2.listAvroFiles(conf, path).flatMap { f =>
      val len = f.getLen
      if (len == 0) Nil
      else (0L until len by maxBytes).map { start =>
        AvroInputPartition(f.getPath.toString, start,
          math.min(start + maxBytes, len))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroPartitionReaderFactory(required, pushed,
      org.apache.spark.sql.graft.Bridge.serializableHadoopConf(
        SparkSession.active))
}

final case class AvroInputPartition(file: String, start: Long, end: Long)
    extends InputPartition

final class AvroPartitionReaderFactory(required: StructType,
    pushed: Seq[org.apache.spark.sql.sources.Filter],
    confGet: () => Configuration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val ap = p.asInstanceOf[AvroInputPartition]
    new AvroPartitionReader(ap, required, pushed, confGet())
  }
}

final class AvroPartitionReader(part: AvroInputPartition,
    required: StructType, pushed: Seq[org.apache.spark.sql.sources.Filter],
    conf: Configuration)
    extends PartitionReader[InternalRow] {

  private val datumReader = new GenericDatumReader[GenericRecord]()
  private val reader: DataFileReader[GenericRecord] =
    DataFileReader.openReader(
      new FsInput(new HPath(part.file), conf), datumReader)
      .asInstanceOf[DataFileReader[GenericRecord]]

  // the pruned READER schema: the writer's fields restricted to the
  // required names — Avro's resolving decoder skips everything else
  private val projection: Schema = {
    val writer = reader.getSchema
    val keep = required.fields.flatMap(f => Option(writer.getField(f.name)))
      .map(f => new Schema.Field(f.name(), f.schema(), f.doc(), f.defaultVal()))
    Schema.createRecord("GraftProjection", null, "graft.avro", false,
      keep.toList.asJava)
  }
  datumReader.setExpected(projection)
  reader.sync(part.start)

  // required field i → its position in the projected record (-1 = the
  // file never had it → null, the schema-evolution contract)
  private val positions: Array[Int] =
    required.fields.map(f =>
      Option(projection.getField(f.name)).map(_.pos()).getOrElse(-1))
  private val names = required.fields.map(_.name)
  private val types = required.fields.map(_.dataType)

  private val filterFns: Array[GenericRecord => Boolean] =
    pushed.toArray.map(AvroDsv2.compileFilter(_, projection, required))

  private var rec: GenericRecord = null

  override def next(): Boolean = {
    while (reader.hasNext && !reader.pastSync(part.end)) {
      rec = reader.next(rec) // record reuse; converted before the next step
      // pushed-filter skip: a record that definitively fails any pushed
      // predicate never becomes an InternalRow (Spark re-applies the same
      // filters post-scan, so an undecidable predicate just passes through)
      var i = 0
      var keep = true
      while (keep && i < filterFns.length) {
        keep = filterFns(i)(rec); i += 1
      }
      if (keep) return true
    }
    false
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(positions.length)
    var i = 0
    while (i < positions.length) {
      val raw = if (positions(i) < 0) null else rec.get(positions(i))
      row.update(i, AvroDsv2.toCatalyst(
        AvroSource.convertValue(raw, names(i), types(i))))
      i += 1
    }
    row
  }

  override def close(): Unit = reader.close()
}

object AvroDsv2 {

  /** The `path` option Spark's `load(path)` populates. */
  private[sources] def pathFrom(m: Map[String, String]): String =
    m.getOrElse("path", throw new IllegalArgumentException(
      "graft-avro requires a path: spark.read.format(...).load(path)"))

  private[sources] def listAvroFiles(conf: Configuration,
      path: String): Seq[FileStatus] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val stat = fs.getFileStatus(p)
    if (stat.isDirectory)
      fs.listStatus(p)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".avro")).toSeq
    else Seq(stat)
  }

  /** Writer schema of the first container file → Spark schema (the
    * inverse of AvroSource.toAvroSchema's flat-primitive mapping). */
  def inferSchema(spark: SparkSession, path: String): StructType = {
    val conf = spark.sparkContext.hadoopConfiguration
    val first = listAvroFiles(conf, path).headOption.getOrElse(
      throw new IllegalArgumentException(s"no .avro files under $path"))
    val r = DataFileReader.openReader(
      new FsInput(first.getPath, conf), new GenericDatumReader[GenericRecord]())
    try StructType(r.getSchema.getFields.asScala.map { f =>
      val (dt, nullable) = toSparkType(f.schema())
      StructField(f.name(), dt, nullable)
    }.toSeq)
    finally r.close()
  }

  private def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"only [null, T] unions are supported, got $s")
      (toSparkType(nonNull.head)._1, branches.size > nonNull.size)
    case Schema.Type.LONG    => (LongType, false)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.BYTES   => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (et, elemNullable) = toSparkType(s.getElementType)
      (ArrayType(et, elemNullable), false)
    case Schema.Type.RECORD =>
      (StructType(s.getFields.asScala.map { f =>
        val (dt, nullable) = toSparkType(f.schema())
        StructField(f.name(), dt, nullable)
      }.toSeq), false)
    case Schema.Type.MAP => throw new IllegalArgumentException(
      s"graft-avro does not support MAP fields ($s): model the map as " +
        "ARRAY<RECORD<key, value>> — Avro maps force string keys and lose " +
        "key-type fidelity on the round trip")
    case other => throw new IllegalArgumentException(
      s"graft-avro supports primitive, array, and record fields only, got $other")
  }

  /** External value (AvroSource.convertValue output) → Catalyst value.
    * Arrays and structs recurse — convertValue already produced
    * element-/field-converted java Lists and external Rows. */
  private[sources] def toCatalyst(v: Any): Any = v match {
    case null           => null
    case s: String      => UTF8String.fromString(s)
    case l: java.util.List[_] => // array field (possibly nested)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        l.asScala.map(toCatalyst).toArray)
    case r: org.apache.spark.sql.Row => // record field
      new GenericInternalRow(r.toSeq.map(toCatalyst).toArray)
    case other          => other // primitives and byte arrays pass through
  }

  import org.apache.spark.sql.sources._

  /** Filters the reader can evaluate on a decoded datum. */
  private[sources] def evaluable(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual
       | _: LessThan | _: LessThanOrEqual | _: In
       | _: IsNull | _: IsNotNull => true
    case _ => false
  }

  /** Exact comparison where types allow; None = undecidable (the record
    * is then KEPT — Spark's residual copy of the filter decides). Longs
    * compare as longs: a double roundtrip would merge values past 2^53
    * and wrongly skip rows. */
  private def tryCmp(v: Any, lit: Any): Option[Int] = (v, lit) match {
    case (a: java.lang.Long, b: java.lang.Long) =>
      Some(java.lang.Long.compare(a, b))
    case (a: java.lang.Long, b: java.lang.Integer) =>
      Some(java.lang.Long.compare(a, b.longValue()))
    case (a: java.lang.Integer, b: java.lang.Long) =>
      Some(java.lang.Long.compare(a.longValue(), b))
    case (a: java.lang.Integer, b: java.lang.Integer) =>
      Some(java.lang.Integer.compare(a, b))
    case (a: Number, b: Number) =>
      Some(java.lang.Double.compare(a.doubleValue(), b.doubleValue()))
    case (a: String, b: String) => Some(a.compareTo(b))
    case (a: java.lang.Boolean, b: java.lang.Boolean) => Some(a.compareTo(b))
    case _ => None
  }

  /** Compile one pushed filter to a datum predicate: false = definitely
    * fails (skip the record), true = passes or undecidable. SQL null
    * semantics: a null field fails every comparison. */
  private[sources] def compileFilter(f: Filter, projection: Schema,
      required: StructType): GenericRecord => Boolean = {
    def getter(attr: String): GenericRecord => Any = {
      val pos = Option(projection.getField(attr)).map(_.pos()).getOrElse(-1)
      val idx = required.fieldNames.indexOf(attr)
      val dt = if (idx >= 0) required(idx).dataType else StringType
      if (pos < 0) _ => null
      else rec => AvroSource.convertValue(rec.get(pos), attr, dt)
    }
    def cmpPred(attr: String, v: Any)(op: Int => Boolean)
        : GenericRecord => Boolean = {
      val g = getter(attr)
      rec => {
        val x = g(rec)
        if (x == null) false else tryCmp(x, v).forall(op)
      }
    }
    f match {
      case EqualTo(a, v)            => cmpPred(a, v)(_ == 0)
      case GreaterThan(a, v)        => cmpPred(a, v)(_ > 0)
      case GreaterThanOrEqual(a, v) => cmpPred(a, v)(_ >= 0)
      case LessThan(a, v)           => cmpPred(a, v)(_ < 0)
      case LessThanOrEqual(a, v)    => cmpPred(a, v)(_ <= 0)
      case In(a, vs) =>
        val g = getter(a)
        rec => {
          val x = g(rec)
          x != null && vs.exists(v => tryCmp(x, v).forall(_ == 0))
        }
      case IsNull(a)    => val g = getter(a); rec => g(rec) == null
      case IsNotNull(a) => val g = getter(a); rec => g(rec) != null
      case _            => _ => true
    }
  }
}
