package graft

import org.apache.spark.sql.functions._
import graft.sinks.ClickHouseSink

/** The north-star sink (BASELINE.json: batch DataFrame write over JDBC),
  * EXECUTED — not just shaped. No ClickHouse driver ships in this sandbox,
  * but Derby's embedded JDBC driver does (and Spark has a DerbyDialect), so
  * the exact production write path — repartition + sortWithinPartitions +
  * Spark's generic JDBC batch insert — runs against a real database and is
  * read back for comparison. Swapping the url/driver pair is all that
  * separates this from a live ClickHouse target.
  */
class SinkSpec extends SparkSpec {

  private lazy val dbRoot = {
    val d = java.nio.file.Files.createTempDirectory("graft_derby").toString
    // keep derby.log out of the repo working tree
    System.setProperty("derby.system.home", d)
    d
  }
  private def cfgFor(table: String, key: Seq[String]) = ClickHouseSink.Config(
    url = s"jdbc:derby:$dbRoot/graftdb;create=true",
    table = table, orderByKey = key,
    // Derby derives the schema from the user; APP is the no-auth default
    user = "APP",
    driver = "org.apache.derby.jdbc.EmbeddedDriver",
    batchSize = 500, numWritePartitions = 2,
    // Derby (unlike ClickHouse) is transactional; NONE is rejected there
    isolationLevel = "READ_COMMITTED")

  /** Production flow is "execute ddl(), then write()" — ClickHouse DDL is
    * MergeTree SQL, so the Derby stand-in gets the equivalent plain DDL.
    * Columns are quoted lowercase because Spark's JDBC insert quotes exact
    * case while unquoted Derby identifiers fold to upper. */
  private def createTable(table: String, cols: (String, String)*): Unit = {
    val conn = java.sql.DriverManager.getConnection(
      s"jdbc:derby:$dbRoot/graftdb;create=true")
    try {
      val ddl = cols.map { case (n, t) => s""""$n" $t""" }
        .mkString(s"CREATE TABLE $table (", ", ", ")")
      conn.createStatement().execute(ddl)
    } finally conn.close()
  }

  private def readBack(table: String) = spark.read.format("jdbc")
    .option("url", s"jdbc:derby:$dbRoot/graftdb")
    .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    .option("dbtable", table)
    .load()

  test("batch JDBC round-trip: write path inserts and reads back exactly") {
    val src = spark.read.parquet(sf("0.001") + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_suppkey"), (col("l_quantity") * 100).cast("long").as("qty_c"))
    createTable("li_rt", "l_orderkey" -> "BIGINT", "l_linenumber" -> "BIGINT",
      "l_suppkey" -> "BIGINT", "qty_c" -> "BIGINT")
    ClickHouseSink.write(src, cfgFor("li_rt", Seq("l_orderkey", "l_linenumber")))
    val got = readBack("li_rt")
    assert(got.count() == src.count())
    val a = src.collect().map(_.toSeq).toSet
    val b = got.collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("batch JDBC append accumulates batches (incremental-load contract)") {
    val src = spark.read.parquet(sf("0.001") + "/region.parquet")
      .select(col("r_regionkey"), col("r_name"))
    createTable("region_inc", "r_regionkey" -> "BIGINT",
      "r_name" -> "VARCHAR(64)")
    val cfg = cfgFor("region_inc", Seq("r_regionkey"))
    ClickHouseSink.write(src, cfg)
    ClickHouseSink.write(src, cfg)
    assert(readBack("region_inc").count() == 2 * src.count())
  }

  test("ClickHouse-dialect golden DDL for the five cgds tables") {
    // No ClickHouse server exists in this sandbox, so the dialect surface
    // is pinned as goldens: ReplacingMergeTree re-import semantics,
    // ORDER BY replace keys, per-study PARTITION BY, LowCardinality
    // dictionary columns. A drift in Schemas or the DDL generator fails
    // here, not at a production CREATE TABLE.
    val ddl = ClickHouseSink.cgdsTables
      .map(t => t.name -> ClickHouseSink.createTableDdl(t)).toMap
    assert(ddl.keySet == Set("genetic_alteration", "genetic_profile_samples",
      "cna_derived", "mutation_event", "mutation"))

    assert(ddl("genetic_alteration") ==
      """CREATE TABLE IF NOT EXISTS `genetic_alteration` (
        |  `CANCER_STUDY` LowCardinality(String),
        |  `GENETIC_PROFILE` LowCardinality(String),
        |  `GENE_SYMBOL` LowCardinality(String),
        |  `VALUES` String
        |) ENGINE = ReplacingMergeTree()
        |PARTITION BY `CANCER_STUDY`
        |ORDER BY (`CANCER_STUDY`, `GENETIC_PROFILE`, `GENE_SYMBOL`)""".stripMargin)

    assert(ddl("genetic_profile_samples") ==
      """CREATE TABLE IF NOT EXISTS `genetic_profile_samples` (
        |  `CANCER_STUDY` LowCardinality(String),
        |  `GENETIC_PROFILE` LowCardinality(String),
        |  `ORDERED_SAMPLE_LIST` String
        |) ENGINE = ReplacingMergeTree()
        |PARTITION BY `CANCER_STUDY`
        |ORDER BY (`CANCER_STUDY`, `GENETIC_PROFILE`)""".stripMargin)

    assert(ddl("cna_derived") ==
      """CREATE TABLE IF NOT EXISTS `cna_derived` (
        |  `SAMPLE_ID` String,
        |  `CANCER_STUDY` LowCardinality(String),
        |  `GENE_SYMBOL` LowCardinality(String),
        |  `GENETIC_PROFILE` LowCardinality(String),
        |  `ALTERATION` String
        |) ENGINE = ReplacingMergeTree()
        |PARTITION BY `CANCER_STUDY`
        |ORDER BY (`CANCER_STUDY`, `GENETIC_PROFILE`, `GENE_SYMBOL`, `SAMPLE_ID`)""".stripMargin)

    // mutation_event: Int64 id key + the 20 string fields of the
    // reference schema (mutation/transformer.go:254-276)
    val evDdl = ddl("mutation_event")
    assert(evDdl.startsWith(
      """CREATE TABLE IF NOT EXISTS `mutation_event` (
        |  `MUTATION_EVENT_ID` Int64,
        |  `ENTREZ_GENE_ID` String,
        |  `CHR` LowCardinality(String),""".stripMargin))
    assert(evDdl.endsWith(
      """) ENGINE = ReplacingMergeTree()
        |ORDER BY (`MUTATION_EVENT_ID`)""".stripMargin))
    assert(evDdl.linesIterator.count(_.startsWith("  `")) ==
      graft.core.Schemas.mutationEvent.length)

    // mutation: the FK table keys on (profile, sample, event) and carries
    // ENTREZ_GENE_ID like the reference (mutation/transformer.go:279-309)
    val muDdl = ddl("mutation")
    assert(muDdl.startsWith(
      """CREATE TABLE IF NOT EXISTS `mutation` (
        |  `MUTATION_EVENT_ID` Int64,
        |  `GENETIC_PROFILE_ID` LowCardinality(String),
        |  `SAMPLE_ID` String,
        |  `ENTREZ_GENE_ID` String,
        |  `CENTER` LowCardinality(String),""".stripMargin))
    assert(muDdl.endsWith(
      """) ENGINE = ReplacingMergeTree()
        |PARTITION BY `GENETIC_PROFILE_ID`
        |ORDER BY (`GENETIC_PROFILE_ID`, `SAMPLE_ID`, `MUTATION_EVENT_ID`)""".stripMargin))
    assert(muDdl.linesIterator.count(_.startsWith("  `")) ==
      graft.core.Schemas.mutation.length)

    // dialect invariants across all five: never a Nullable ORDER BY
    // column, version-less ReplacingMergeTree, ticked identifiers
    ClickHouseSink.cgdsTables.foreach { t =>
      val d = ddl(t.name)
      t.orderBy.foreach { k =>
        val line = d.linesIterator.find(_.startsWith(s"  `$k`")).get
        assert(!line.contains("Nullable"), s"${t.name}.$k must not be Nullable")
      }
      assert(d.contains("ENGINE = ReplacingMergeTree()"))
    }
  }

  test("streaming foreachBatch lands every micro-batch in the database") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcPath = sf("0.001") + "/events.parquet"
    val schema = spark.read.parquet(srcPath).schema
    val dir = java.nio.file.Files.createTempDirectory("graft_ev_stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(srcPath),
      dir.resolve("part-0.parquet"))
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .select("event_id", "user_id", "event_type")
    createTable("events_stream", "event_id" -> "BIGINT",
      "user_id" -> "BIGINT", "event_type" -> "VARCHAR(64)",
      "__graft_batch_id" -> "BIGINT")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ev_ckpt").toString
    val q = ClickHouseSink.writeStream(stream,
      cfgFor("events_stream", Seq("user_id", "event_id")), ckpt)
    try q.processAllAvailable() finally q.stop()
    val got = readBack("events_stream")
    assert(got.count() == spark.read.parquet(srcPath).count())
    // the batch-id stamp that makes server-side replay dedup possible
    assert(got.columns.map(_.toLowerCase).contains("__graft_batch_id"))
  }
}
