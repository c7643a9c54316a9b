package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.types._

/** North-star sink (BASELINE.json): batch DataFrame → ClickHouse over JDBC.
  *
  * No ClickHouse JDBC driver ships in this zero-egress environment, so this
  * stays a thin, config-driven wrapper around Spark's generic JDBC writer —
  * the 100 TB-relevant part is the *write shape*, which is handled here:
  * repartition to bound per-task insert size and sort within partitions by
  * the target table's ORDER BY key so ClickHouse parts arrive pre-sorted
  * (cheap merges, good primary-key locality).
  */
object ClickHouseSink {

  final case class Config(
      url: String,                       // jdbc:clickhouse://host:8123/db
      table: String,
      orderByKey: Seq[String],           // ClickHouse engine ORDER BY columns
      user: String = "default",
      password: String = "",
      batchSize: Int = 100000,
      numWritePartitions: Int = 0,       // 0 = keep current partitioning
      driver: String = "",               // explicit JDBC driver class, if any
      isolationLevel: String = "NONE")   // ClickHouse has no transactions

  /** The write shape, exposed for testing: repartition to bound per-task
    * insert size, then sort within partitions by the ClickHouse ORDER BY
    * key (pre-sorted parts → cheap merges on the server). */
  def shape(df: DataFrame, cfg: Config): DataFrame = {
    val shaped0 =
      if (cfg.numWritePartitions > 0) df.repartition(cfg.numWritePartitions)
      else df
    if (cfg.orderByKey.nonEmpty)
      shaped0.sortWithinPartitions(cfg.orderByKey.map(df(_)): _*)
    else shaped0
  }

  /** Spark type → ClickHouse type. Strings are non-Nullable by default
    * (matching the reference's all-string tables, which cgds.sql declares
    * NOT NULL); pass nullable=true columns through Nullable(T). */
  def clickhouseType(dt: DataType): String = dt match {
    case StringType => "String"
    case LongType => "Int64"
    case IntegerType => "Int32"
    case ShortType => "Int16"
    case ByteType => "Int8"
    case DoubleType => "Float64"
    case FloatType => "Float32"
    case BooleanType => "Bool"
    case DateType => "Date32"
    case _: TimestampType => "DateTime64(6, 'UTC')"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case ArrayType(e, _) => s"Array(${clickhouseType(e)})"
    case BinaryType => "String"
    case other =>
      throw new IllegalArgumentException(s"no ClickHouse mapping for $other")
  }

  /** CREATE TABLE DDL for a DataFrame schema — MergeTree ordered by the
    * sink's ORDER BY key, the engine the cgds tables target. */
  def ddl(schema: StructType, cfg: Config): String = {
    val cols = schema.fields.map { f =>
      val t = clickhouseType(f.dataType)
      s"  `${f.name}` ${if (f.nullable && f.dataType != StringType) s"Nullable($t)" else t}"
    }.mkString(",\n")
    val orderBy =
      if (cfg.orderByKey.nonEmpty) cfg.orderByKey.mkString("(", ", ", ")")
      else "tuple()"
    s"CREATE TABLE IF NOT EXISTS ${cfg.table} (\n$cols\n) ENGINE = MergeTree ORDER BY $orderBy"
  }

  /** Full ClickHouse table definition for the dialect-specific DDL the
    * importer's target tables need: engine family, ORDER BY (primary key),
    * optional PARTITION BY, and the columns that should be dictionary-
    * encoded (`LowCardinality`). */
  final case class TableSpec(
      name: String,
      schema: StructType,
      orderBy: Seq[String],
      engine: String = "ReplacingMergeTree",
      versionCol: Option[String] = None,     // ReplacingMergeTree(ver)
      partitionBy: Option[String] = None,
      lowCardinality: Set[String] = Set.empty) {
    require(orderBy.forall(schema.fieldNames.contains),
      s"ORDER BY ${orderBy.mkString(",")} not all in ${schema.fieldNames.mkString(",")}")
    require(partitionBy.forall(schema.fieldNames.contains), s"bad partitionBy")
    require(versionCol.forall(schema.fieldNames.contains), s"bad versionCol")
  }

  /** CREATE TABLE in full ClickHouse dialect. Conventions:
    *  - enumerated-ish String columns render as `LowCardinality(String)`
    *    (dictionary encoding — the right call for study/profile/status
    *    columns whose distinct count is tiny next to row count);
    *  - ORDER BY columns are never Nullable (ClickHouse default constraint
    *    `allow_nullable_key=0`), enforced here rather than at the server;
    *  - the default engine is ReplacingMergeTree: re-importing a study
    *    replaces rows with the same ORDER BY key at merge time, which is
    *    the importer's re-run semantics (reference README.md:1-61 —
    *    repeated conversion of the same study must not duplicate).
    */
  def createTableDdl(spec: TableSpec): String = {
    val orderBySet = spec.orderBy.toSet
    val cols = spec.schema.fields.map { f =>
      val base = clickhouseType(f.dataType)
      val lowCard =
        if (spec.lowCardinality(f.name) && base == "String")
          s"LowCardinality($base)"
        else base
      val t =
        if (f.nullable && f.dataType != StringType && !orderBySet(f.name))
          s"Nullable($lowCard)"
        else lowCard
      s"  `${f.name}` $t"
    }.mkString(",\n")
    val engine = spec.versionCol match {
      case Some(v) => s"${spec.engine}(`$v`)"
      case None    => s"${spec.engine}()"
    }
    val partition =
      spec.partitionBy.map(p => s"\nPARTITION BY `$p`").getOrElse("")
    val orderBy = spec.orderBy.map(c => s"`$c`").mkString("(", ", ", ")")
    s"""CREATE TABLE IF NOT EXISTS `${spec.name}` (
       |$cols
       |) ENGINE = $engine$partition
       |ORDER BY $orderBy""".stripMargin
  }

  /** The five cgds.sql-mirroring output tables (reference schema goals:
    * cna/transformer.go:438-459, mutation/transformer.go:254-309) as
    * ClickHouse targets. ORDER BY = the natural replace key of each
    * table; the per-study tables partition by CANCER_STUDY so a study
    * re-import is a cheap partition-scoped operation; dictionary-encoded
    * columns are the study/profile/status/enum-ish ones. */
  val cgdsTables: Seq[TableSpec] = Seq(
    TableSpec("genetic_alteration", graft.core.Schemas.geneticAlteration,
      orderBy = Seq("CANCER_STUDY", "GENETIC_PROFILE", "GENE_SYMBOL"),
      partitionBy = Some("CANCER_STUDY"),
      lowCardinality = Set("CANCER_STUDY", "GENETIC_PROFILE", "GENE_SYMBOL")),
    TableSpec("genetic_profile_samples", graft.core.Schemas.geneticProfileSamples,
      orderBy = Seq("CANCER_STUDY", "GENETIC_PROFILE"),
      partitionBy = Some("CANCER_STUDY"),
      lowCardinality = Set("CANCER_STUDY", "GENETIC_PROFILE")),
    TableSpec("cna_derived", graft.core.Schemas.cnaDerived,
      orderBy = Seq("CANCER_STUDY", "GENETIC_PROFILE", "GENE_SYMBOL", "SAMPLE_ID"),
      partitionBy = Some("CANCER_STUDY"),
      lowCardinality = Set("CANCER_STUDY", "GENETIC_PROFILE", "GENE_SYMBOL")),
    TableSpec("mutation_event", graft.core.Schemas.mutationEvent,
      orderBy = Seq("MUTATION_EVENT_ID"),
      lowCardinality = Set("CHR", "MUTATION_TYPE", "NCBI_BUILD", "STRAND",
        "VARIANT_TYPE", "DB_SNP_VAL_STATUS", "CANONICAL_TRANSCRIPT")),
    TableSpec("mutation", graft.core.Schemas.mutation,
      orderBy = Seq("GENETIC_PROFILE_ID", "SAMPLE_ID", "MUTATION_EVENT_ID"),
      partitionBy = Some("GENETIC_PROFILE_ID"),
      lowCardinality = Set("GENETIC_PROFILE_ID", "CENTER", "SEQUENCER",
        "MUTATION_STATUS", "VALIDATION_STATUS", "VERIFICATION_STATUS",
        "SEQUENCING_PHASE", "SEQUENCE_SOURCE", "VALIDATION_METHOD")))

  /** Streaming → ClickHouse incremental load: every micro-batch goes
    * through the SAME shape+write path as batch (foreachBatch), stamped
    * with its batchId. The checkpoint gives at-least-once delivery; the
    * batchId column makes replays deduplicable server-side
    * (ReplacingMergeTree keyed on (orderByKey, __graft_batch_id), or the
    * insert-dedup window) — the standard exactly-once-to-ClickHouse
    * recipe. */
  def writeStream(df: DataFrame, cfg: Config, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    writeStreamWith(df, checkpointDir, (batch, id) =>
      write(batch.withColumn("__graft_batch_id",
        org.apache.spark.sql.functions.lit(id)), cfg))

  /** foreachBatch plumbing with a pluggable batch sink — lets tests (and
    * alternative targets) reuse the streaming machinery without a JDBC
    * server. */
  def writeStreamWith(df: DataFrame, checkpointDir: String,
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(sink)
      .start()

  def write(df: DataFrame, cfg: Config): Unit = {
    val w = shape(df, cfg).write
      .format("jdbc")
      .mode(SaveMode.Append)
      .option("url", cfg.url)
      .option("dbtable", cfg.table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("batchsize", cfg.batchSize.toString)
      .option("isolationLevel", cfg.isolationLevel)
    (if (cfg.driver.nonEmpty) w.option("driver", cfg.driver) else w).save()
  }
}
