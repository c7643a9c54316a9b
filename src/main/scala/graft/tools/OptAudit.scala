package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.TableLog

/** Silent-dead-optimization audit (the round-18 lesson generalized):
  * a feature can be oracle-green while a whole Spark optimizer
  * integration is OFF, because the oracle checks answers, not plans.
  * This tool probes the three integration points the dead runtime
  * group filter pointed at, on REAL log tables, and prints what the
  * plans actually contain:
  *
  *   A. `InjectRuntimeFilter` — does a bloom runtime filter
  *      materialize on the fact side of a log-table ⨝ dim join, on
  *      (1) a plain-parquet control, (2) `TableLog.scan` on a vanilla
  *      session (PruneLogScan expands in the LAST optimizer batch,
  *      AFTER InjectRuntimeFilter — so injection must handle the
  *      unexpanded GraftLogRelation leaf), and (3) the same scan on a
  *      GraftExtensions session (expansion happens mid
  *      operator-optimization, BEFORE InjectRuntimeFilter)? The
  *      engine's own planning-time key prune (`dynJoin`) is disabled
  *      for the probe — bloom is exactly the fallback for dims too
  *      big to collect at planning.
  *
  *   B. AQE skew-join — when a MOR key-sidecar anti-join is forced to
  *      sort-merge (delete set too big to broadcast) and the data is
  *      heavily skewed on the delete key column, does
  *      `OptimizeSkewedJoin` split the hot partition (`skew=true` in
  *      the final adaptive plan)?
  *
  *   C. The catalog MERGE cardinality check — what join shape and how
  *      many exchanges does the canonical two-clause MERGE plan, and
  *      how does wall time scale with table size (the check must ride
  *      the join, not add a pass)?
  *
  *   sbt "runMain graft.tools.OptAudit"
  *
  * Prints one JSON line (plus per-face plan excerpts on stderr).
  */
object OptAudit {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionProfile.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_optaudit")
      .toString

    // ── A. InjectRuntimeFilter over log-table joins ─────────────────
    val factRows = 4000000L
    val factDf = spark.range(factRows)
      .select($"id".as("k"), ($"id" % 1000).as("v"))
      .repartitionByRange(32, $"k")
    val factLog = s"$tmp/fact_log"
    TableLog.create(spark, factLog, factDf, statsCols = Seq("k"))
    val factPq = s"$tmp/fact_pq"
    factDf.write.parquet(factPq)
    // dim covers the whole key domain; tag=7 keeps ~1/101 of it
    spark.range(400000L)
      .select(($"id" * 10).as("k"), ($"id" % 101).as("tag"))
      .write.parquet(s"$tmp/dim_pq")

    def withConfs(s: SparkSession, kv: (String, String)*)(f: => Unit)
        : Unit = {
      val prev = kv.map { case (k, _) =>
        k -> scala.util.Try(s.conf.get(k)).toOption }
      kv.foreach { case (k, v) => s.conf.set(k, v) }
      try f finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
    val bloomConfs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1",
      graft.plans.PruneLogScan.DYN_KEY -> "false")

    def bloomProbe(s: SparkSession, fact: => DataFrame)
        : (Boolean, Boolean, Long) = {
      var res: (Boolean, Boolean, Long) = (false, false, -1L)
      withConfs(s, bloomConfs: _*) {
        val dim = s.read.parquet(s"$tmp/dim_pq").where(col("tag") === 7)
        val q = fact.join(dim, Seq("k")).agg(sum(col("v")).as("s"))
        val opt = q.queryExecution.optimizedPlan.toString
        val n = q.collect()(0).getLong(0)
        val exec = q.queryExecution.executedPlan.toString
        System.err.println(s"--- bloom optimized plan head ---\n" +
          opt.linesIterator.take(12).mkString("\n"))
        res = (opt.contains("might_contain"),
          exec.contains("might_contain"), n)
      }
      res
    }
    val (aPqOpt, aPqExec, aPqSum) =
      bloomProbe(spark, spark.read.parquet(factPq))
    val (aScanOpt, aScanExec, aScanSum) =
      bloomProbe(spark, TableLog.scan(spark, factLog))
    val ext = graft.GraftSessions.withExtensions(spark)
    val (aExtOpt, aExtExec, aExtSum) =
      bloomProbe(ext, TableLog.scan(ext, factLog))
    require(aPqSum == aScanSum && aPqSum == aExtSum,
      s"bloom probe answers diverged: $aPqSum / $aScanSum / $aExtSum")

    // ── B. AQE skew-join on the MOR anti-join ───────────────────────
    // 70% of rows share one key; files hash-partitioned on v so every
    // file spans the key domain (no stat prune); delete keys scattered
    val skewRows = 3000000L
    val skewLog = s"$tmp/mor_log"
    // v must be INCOMPRESSIBLE: partition sizes AQE sees are
    // compressed map-output bytes, and a run of constant hot-key rows
    // with a cyclic payload compresses under the skew threshold
    TableLog.create(spark, skewLog,
      spark.range(skewRows).select(
        when($"id" % 10 < 7, lit(42L)).otherwise($"id").as("k"),
        xxhash64($"id").as("v")).repartition(16,
        ($"id" % 16).cast("int")),
      statsCols = Seq("k"))
    // keys ≡ 7 (mod 10) EXIST in the table (non-hot rows keep k = id
    // with id % 10 ∈ {7,8,9}) — deleteMor commits no sidecar when
    // nothing matches, so the key set must really hit rows
    val delVer = TableLog.deleteMor(spark, skewLog, "k",
      spark.range(4000).select(($"id" * 700 + 7).as("k")))
    require(TableLog.snapshot(skewLog).get.dels.nonEmpty,
      s"skew probe: deleteMor v$delVer committed no sidecar")
    var (bSkewed, bCount, bJoin) = (0, -1L, "none")
    withConfs(spark,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0") {
      val q = TableLog.read(spark, skewLog).groupBy()
        .agg(count(lit(1)).as("c"), max($"v").as("m"))
      bCount = q.collect()(0).getLong(0)
      require(bCount < skewRows, s"skew probe: anti-join dropped nothing")
      val exec = q.queryExecution.executedPlan.toString
      bSkewed = "skew=true".r.findAllIn(exec).length
      bJoin =
        if (exec.contains("SortMergeJoin")) "smj"
        else if (exec.contains("BroadcastHashJoin")) "bhj"
        else if (exec.contains("ShuffledHashJoin")) "shj"
        else "none"
      System.err.println(s"--- skew executed plan (joins) ---\n" +
        exec.linesIterator.filter(l =>
          l.contains("Join") || l.contains("skew")).mkString("\n"))
    }

    // ── B2. OptimizeShuffleWithLocalRead over a log-table join ─────
    // static planning keeps the SMJ (autoBroadcast -1 statically is
    // not set here: static 10MB default sees a small dim and
    // broadcasts at plan time, so instead force the RUNTIME
    // conversion shape: static threshold too small for the ESTIMATE,
    // adaptive threshold large enough for the MEASURED size) — AQE
    // converts to broadcast and the local-read rule should then turn
    // the fact side's shuffle read into mapper-local partitions
    // ("AQEShuffleRead local"), erasing the wasted exchange.
    var (b2Local, b2Join) = (0, "none")
    withConfs(spark,
      "spark.sql.autoBroadcastJoinThreshold" -> "1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "64m",
      graft.plans.PruneLogScan.DYN_KEY -> "false") {
      val dim = spark.read.parquet(s"$tmp/dim_pq").where(col("tag") === 7)
      val q = TableLog.scan(spark, factLog).join(dim, Seq("k"))
        .agg(sum(col("v")).as("s"))
      q.collect()
      val exec = q.queryExecution.executedPlan.toString
      b2Local = "AQEShuffleRead local".r.findAllIn(exec).length
      b2Join =
        if (exec.contains("BroadcastHashJoin")) "bhj"
        else if (exec.contains("SortMergeJoin")) "smj" else "none"
    }

    // ── C. MERGE cardinality-check shape + scaling ──────────────────
    val cat = "graft_oa"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$tmp/wh")
    graft.plans.ResolveGraftCatalogReads.install(spark)
    spark.sql(s"CREATE NAMESPACE $cat.oa")
    def mergeAt(name: String, files: Int, rowsPerFile: Long)
        : (Double, Int, Boolean) = {
      spark.sql(s"CREATE TABLE $cat.oa.$name (k BIGINT, v BIGINT) " +
        "TBLPROPERTIES ('statsCols' = 'k')")
      val n = files * rowsPerFile
      TableLog.append(spark, s"$tmp/wh/oa/$name",
        spark.range(n).select($"id".as("k"), ($"id" % 97).as("v"))
          .repartitionByRange(files, $"k"),
        statsCols = Seq("k"))
      // source touches every file: scattered updates + a few inserts
      spark.range(10000)
        .select(($"id" * (n / 10000) + 1).as("k"), lit(-1L).as("v"))
        .createOrReplaceTempView("oa_src")
      val sqlText =
        s"""MERGE INTO $cat.oa.$name t USING oa_src s ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET v = s.v
          WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""
      val plan = spark.sql("EXPLAIN EXTENDED " + sqlText)
        .collect()(0).getString(0)
      val exch = "Exchange".r.findAllIn(plan).length
      val mergeRows = plan.contains("MergeRows")
      System.err.println(s"--- merge $name physical plan ---\n" +
        plan.linesIterator.dropWhile(!_.contains("Physical Plan"))
          .take(30).mkString("\n"))
      val (_, t) = timed(spark.sql(sqlText))
      (t, exch, mergeRows)
    }
    val (c16, c16Ex, c16Mr) = mergeAt("m16", 16, 200000L)
    val (c64, c64Ex, c64Mr) = mergeAt("m64", 64, 200000L)

    println(s"""{"tool":"OptAudit"""" +
      s""","bloom_parquet":{"opt":$aPqOpt,"exec":$aPqExec}""" +
      s""","bloom_logscan":{"opt":$aScanOpt,"exec":$aScanExec}""" +
      s""","bloom_logscan_ext":{"opt":$aExtOpt,"exec":$aExtExec}""" +
      s""","skew_splits":$bSkewed,"skew_join":"$bJoin"""" +
      s""","skew_rows":$bCount""" +
      s""","local_reads":$b2Local,"local_read_join":"$b2Join"""" +
      s""","merge16":{"sec":${f"$c16%.3f"},"exchanges":$c16Ex,"mergeRows":$c16Mr}""" +
      s""","merge64":{"sec":${f"$c64%.3f"},"exchanges":$c64Ex,"mergeRows":$c64Mr}}""")
    spark.stop()
  }
}
