package graft

import graft.plans.RewriteRankFilterToTopK
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RewriteRankFilterToTopK: plan shape + row-for-row equivalence with the
  * window formulation it replaces. */
class PlanRewriteSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    RewriteRankFilterToTopK.install(spark)
    spark.conf.set(RewriteRankFilterToTopK.CONF_KEY, "true")
    try f finally spark.conf.set(RewriteRankFilterToTopK.CONF_KEY, "false")
  }

  private def topkDf(k: Int): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    spark.read.parquet(sf("0.001") + "/orders.parquet")
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  test("rewrite fires: window gone, top_k_rows aggregate present") {
    val df = withRule { val d = topkDf(3); d.queryExecution.optimizedPlan; d }
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collectFirst { case w: LWindow => w }.isEmpty,
      s"window must be rewritten away:\n$opt")
    assert(opt.collectFirst { case a: Aggregate => a }.nonEmpty)
    assert(df.queryExecution.executedPlan.toString.contains("top_k_rows"))
  }

  test("rewrite preserves rows exactly (orderBy total, so deterministic)") {
    val expected = topkDf(3).orderBy("o_custkey", "rn").collect()
    val got = withRule {
      val d = topkDf(3).orderBy("o_custkey", "rn")
      d.queryExecution.optimizedPlan
      d
    }.collect()
    assert(got.length == expected.length)
    assert(got.sameElements(expected))
  }

  test("k=1 via equality predicate") {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey"))
    val base = spark.read.parquet(sf("0.001") + "/orders.parquet")
      .withColumn("rn", row_number().over(w))
    val expected = base.where(col("rn") === 1)
      .select("o_custkey", "o_orderkey").orderBy("o_custkey").collect()
    val got = withRule {
      val d = base.where(col("rn") === 1)
        .select("o_custkey", "o_orderkey").orderBy("o_custkey")
      assert(d.queryExecution.optimizedPlan.collectFirst {
        case w: LWindow => w }.isEmpty)
      d
    }.collect()
    assert(got.sameElements(expected))
  }

  test("extra filter conjuncts survive above the rewrite") {
    val expected = topkDf(3).where(col("o_custkey") % 2 === 0)
      .orderBy("o_custkey", "rn").collect()
    val got = withRule {
      val d = topkDf(3).where(col("o_custkey") % 2 === 0)
        .orderBy("o_custkey", "rn")
      assert(d.queryExecution.optimizedPlan.collectFirst {
        case w: LWindow => w }.isEmpty)
      d
    }.collect()
    assert(got.sameElements(expected))
  }

  test("does not fire on rank() or rn >= k or when disabled") {
    // disabled: conf flag down (default) — window stays
    val d0 = topkDf(3)
    assert(d0.queryExecution.optimizedPlan.collectFirst {
      case w: LWindow => w }.nonEmpty)
    // rank() is not row_number: tie semantics differ, must not rewrite
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
    val ranked = spark.read.parquet(sf("0.001") + "/orders.parquet")
      .withColumn("rk", rank().over(w)).where(col("rk") <= 3)
    withRule {
      assert(ranked.queryExecution.optimizedPlan.collectFirst {
        case w: LWindow => w }.nonEmpty)
    }
    // rn >= 2 is not a top-k bound
    val tail = spark.read.parquet(sf("0.001") + "/orders.parquet")
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_custkey").orderBy("o_orderkey")))
      .where(col("rn") >= 2)
    withRule {
      assert(tail.queryExecution.optimizedPlan.collectFirst {
        case w: LWindow => w }.nonEmpty)
    }
  }

  test("global top-k (no partition columns) also rewrites") {
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val base = spark.read.parquet(sf("0.001") + "/orders.parquet")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5).select("o_orderkey", "rn")
    val expected = base.orderBy("rn").collect()
    val got = withRule {
      val d = base.orderBy("rn")
      assert(d.queryExecution.optimizedPlan.collectFirst {
        case w: LWindow => w }.isEmpty)
      d
    }.collect()
    assert(got.sameElements(expected))
  }
}
