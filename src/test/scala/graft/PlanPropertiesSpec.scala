package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Plan-property assertions for the flagship registry queries: the scan
  * must be pruned and pushed-down, aggregation must be two-phase, and
  * dimension joins must broadcast. These are the properties that decide
  * 100 TB behavior — asserting them here pins them against regressions
  * (a plan that silently reads all columns or shuffles a dimension would
  * still pass the row-level oracle). */
class PlanPropertiesSpec extends SparkSpec {

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    val plan = df.queryExecution.executedPlan
    val root = plan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    root.collect { case s: FileSourceScanExec => s }
  }

  test("q1 aggregation prunes the lineitem scan to the referenced columns") {
    val df = SparkEntry.queries("e5_q1_agg")(spark, sf("0.001"))
    val s = scans(df)
    assert(s.nonEmpty)
    val read = s.head.requiredSchema.fieldNames.toSet
    // 11-column table, 5 referenced
    assert(read == Set("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount"), s"read too much: $read")
  }

  test("filters reach the parquet scan as pushed-down predicates") {
    val df = spark.read.parquet(sf("0.001") + "/lineitem.parquet")
      .where(col("l_quantity") >= 30 && col("l_returnflag") === "R")
      .select("l_orderkey")
    val s = scans(df).head
    val pushed = s.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_quantity,30") &&
      pushed.contains("EqualTo(l_returnflag,R)"), s"not pushed: $pushed")
    assert(s.requiredSchema.fieldNames.length <= 3) // key + filter cols only
  }

  test("grouped aggregation is two-phase (map-side partial + final)") {
    val df = SparkEntry.queries("e5_q1_agg")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"),
      s"expected map-side partial aggregation:\n$plan")
  }

  test("five-way join broadcasts all three dimension sides") {
    val df = SparkEntry.queries("e6_join_5way")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 3, s"expected 3 broadcast joins, got $broadcasts")
  }

  test("whole-stage codegen covers the text-signature pipeline") {
    val df = SparkEntry.queries("e2_simhash_buckets")(spark, sf("0.001"))
    df.collect() // AQE: codegen stages only materialize in the FINAL plan
                 // of THIS dataframe (count() would plan a different query)
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd operators render with a "*(stageId)" prefix; the projection
    // evaluating the signature expression must carry one
    val sigLine = plan.linesIterator
      .find(_.contains("simhash_bits")).getOrElse("")
    assert(sigLine.contains("*("),
      s"signature projection fell out of codegen:\n$plan")
  }

  test("top-k rewrite plan has no Window or global Sort operator") {
    val df = SparkEntry.queries("e7_topk_agg")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window survived:\n$plan")
    assert(plan.contains("top_k_by_value") || plan.contains("TopK"),
      s"bounded-heap aggregate missing:\n$plan")
  }

  test("brute-force ANN top-k is TakeOrderedAndProject, not a global sort") {
    val df = SparkEntry.queries("e3_topk_cosine")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition heap + driver merge:\n$plan")
  }

  test("incremental embed probe broadcasts the batch — index rows never shuffle") {
    // the cosine verify must be a broadcast join (batch side) over the
    // pruned index scan: a regression to a shuffle join moves the index's
    // ~1 KB quantized rows through an exchange (measured 4.3s of an 11.7s
    // batch at sf10) while still passing the row-level oracle
    val df = SparkEntry.queries("e2_incremental_embed")(spark, sf("0.001"))
    val plan = df.queryExecution.executedPlan.toString
    // the cached decisions relation embeds its AQE-executed plan; judge
    // the FINAL plan only (the Initial Plan section legitimately shows
    // the pre-AQE sort-merge alternatives)
    val finalPlan = plan.split("== Initial Plan ==").head
    assert("BroadcastHashJoin".r.findAllIn(finalPlan).nonEmpty,
      s"expected broadcast probe joins:\n$finalPlan")
    assert(!finalPlan.contains("SortMergeJoin"),
      s"index-side sort-merge join crept into the probe:\n$finalPlan")
  }

  test("bloom runtime filter (InjectRuntimeFilter) is LIVE over a " +
      "log-table fact ⨝ filtered-dim join") {
    import graft.sinks.TableLog
    import spark.implicits._
    // Round-19 audit pin: Spark's InjectRuntimeFilter must treat the
    // GraftLogRelation leaf as a filter-application-side scan (it runs
    // BEFORE the late PruneLogScan expansion on live sessions), so a
    // selective dim filter grows a bloom might_contain() on the fact
    // side. The engine's own planning-time key prune (dynJoin) covers
    // collectable dims; bloom is the 100 TB fallback for dims past the
    // collect gate — this pin FAILS if that fallback ever goes dead
    // (e.g. a nondeterministic expression sneaks into the scan path
    // and the injected filter is stripped, the round-18 failure mode).
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_plan_bloomrf").toString
    TableLog.create(spark, s"$tmp/fact",
      spark.range(200000).select($"id".as("k"), ($"id" % 1000).as("v"))
        .repartitionByRange(8, $"k"),
      statsCols = Seq("k"))
    spark.range(20000).select(($"id" * 10).as("k"), ($"id" % 101).as("tag"))
      .write.parquet(s"$tmp/dim")
    val tuned = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1",
      graft.plans.PruneLogScan.DYN_KEY -> "false")
    val prev = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dim = spark.read.parquet(s"$tmp/dim").where($"tag" === 7)
      val q = TableLog.scan(spark, s"$tmp/fact").join(dim, Seq("k"))
        .agg(sum($"v").as("s"))
      assert(q.queryExecution.optimizedPlan.toString
          .contains("might_contain"),
        "no bloom runtime filter in the optimized plan:\n" +
          q.queryExecution.optimizedPlan)
      q.collect()
      assert(q.queryExecution.executedPlan.toString
          .contains("might_contain"),
        "the bloom runtime filter was stripped before execution:\n" +
          q.queryExecution.executedPlan)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
