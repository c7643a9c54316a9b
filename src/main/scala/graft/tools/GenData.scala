package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: generate driver-testdata-SHAPED tables at an arbitrary scale
  * factor, for scale-headroom benchmarking beyond the provided sf0.1
  * (`/root/testdata` is read-only and tops out there).
  *
  *   sbt "runMain graft.tools.GenData 1.0 testdata-sf1"
  *
  * Faithful to the driver tables in schema (names, types — events.ts is
  * written as LongType NANOSECONDS, one of the two physical shapes
  * `core/EventTime` normalizes; the driver's own data has since moved to
  * timestamp[us], and the engine reads either), key relationships
  * (orders→customer, lineitem→orders/part/supplier, 4 lines per order,
  * documents' 31-word vocabulary / 10-100 token lengths / 5 langs / 20
  * sources, embeddings' 64 dims with 10 weak label clusters), and value
  * ranges. NOT faithful in exact distribution shape — duplicates and value
  * skew are whatever the hash streams give — so it is a BENCH input, not
  * an oracle input.
  *
  * Fully distributed and deterministic: every column is a pure expression
  * of the row id via xxhash64 (no rand(), no driver-side materialization),
  * so any scale factor generates identically regardless of parallelism.
  */
object GenData {

  private def h(cols: org.apache.spark.sql.Column*) = xxhash64(cols: _*)
  /** uniform long in [0, n) from a hash of (salt, id) */
  private def u(id: org.apache.spark.sql.Column, salt: Int, n: Long) =
    pmod(h(lit(salt), id), lit(n))

  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0).toDouble else 1.0
    val outDir = if (args.length > 1) args(1) else s"testdata-sf$sf"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionProfile.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // row counts at sf=1 (10x the driver's sf0.1)
    def n(base: Long) = math.max(1L, (base * sf).toLong)
    val nCustomer = n(150000)
    val nSupplier = n(10000)
    val nPart = n(200000)
    val nOrders = n(1500000)
    val nLineitem = nOrders * 4
    val nEvents = n(1000000)
    val nUsers = n(15000)
    val nDocs = n(50000)
    val nVecs = n(20000)

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[gen] wrote $name")
    }

    val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    write("region", regions.zipWithIndex
      .map { case (r, i) => (i, r) }.toDF("r_regionkey", "r_name"))
    write("nation", (0 until 25)
      .map(i => (i, f"NATION_$i%02d", i % 5)).toDF("n_nationkey", "n_name", "n_regionkey"))

    val segs = array(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY").map(lit): _*)
    write("customer", spark.range(nCustomer).select(
      $"id".as("c_custkey"),
      format_string("Customer#%09d", $"id").as("c_name"),
      u($"id", 1, 25).cast("int").as("c_nationkey"),
      (u($"id", 2, 1000000).cast("double") / 100).as("c_acctbal"),
      element_at(segs, u($"id", 3, 5).cast("int") + 1).as("c_mktsegment")))

    write("supplier", spark.range(nSupplier).select(
      $"id".as("s_suppkey"),
      format_string("Supplier#%09d", $"id").as("s_name"),
      u($"id", 4, 25).cast("int").as("s_nationkey"),
      (u($"id", 5, 1000000).cast("double") / 100).as("s_acctbal")))

    val adjs = array(Seq("large", "hot", "small", "cold", "shiny", "dim",
      "round", "flat").map(lit): _*)
    val nouns = array(Seq("ring", "bolt", "washer", "nut", "screw", "gear",
      "cog", "pin").map(lit): _*)
    val types = array(Seq("LARGE", "ECONOMY", "STANDARD", "SMALL",
      "MEDIUM").map(lit): _*)
    write("part", spark.range(nPart).select(
      $"id".as("p_partkey"),
      concat_ws(" ", element_at(adjs, u($"id", 6, 8).cast("int") + 1),
        element_at(nouns, u($"id", 7, 8).cast("int") + 1)).as("p_name"),
      concat(lit("Brand#"), u($"id", 8, 25) + 1).as("p_brand"),
      element_at(types, u($"id", 9, 5).cast("int") + 1).as("p_type"),
      (u($"id", 10, 50).cast("int") + 1).as("p_size"),
      (lit(900.0) + u($"id", 11, 10000).cast("double") / 100).as("p_retailprice")))

    val statuses = array(Seq("O", "F", "P").map(lit): _*)
    val prios = array(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW").map(lit): _*)
    // orderdate: 1995-01-01 + 0..2400 days (driver range 1995..2001)
    val epoch95 = lit(java.time.LocalDate.of(1995, 1, 1).toEpochDay)
    write("orders", spark.range(nOrders).select(
      $"id".as("o_orderkey"),
      u($"id", 12, nCustomer).as("o_custkey"),
      element_at(statuses, u($"id", 13, 3).cast("int") + 1).as("o_orderstatus"),
      (u($"id", 14, 40000000).cast("double") / 100 + 900).as("o_totalprice"),
      to_timestamp(date_from_unix_date((epoch95 + u($"id", 15, 2400)).cast("int")))
        .as("o_orderdate"),
      element_at(prios, u($"id", 16, 5).cast("int") + 1).as("o_orderpriority")))

    val flags = array(Seq("A", "N", "R").map(lit): _*)
    val lstat = array(Seq("O", "F").map(lit): _*)
    write("lineitem", spark.range(nLineitem).select(
      ($"id" / 4).cast("long").as("l_orderkey"),
      u($"id", 17, nPart).as("l_partkey"),
      u($"id", 18, nSupplier).as("l_suppkey"),
      (pmod($"id", lit(4)).cast("int") + 1).as("l_linenumber"),
      (u($"id", 19, 48).cast("double") + 1).as("l_quantity"),
      (u($"id", 20, 10400000).cast("double") / 100 + 900).as("l_extendedprice"),
      (u($"id", 21, 11).cast("double") / 100).as("l_discount"),
      (u($"id", 22, 9).cast("double") / 100).as("l_tax"),
      element_at(flags, u($"id", 23, 3).cast("int") + 1).as("l_returnflag"),
      element_at(lstat, u($"id", 24, 2).cast("int") + 1).as("l_linestatus"),
      to_timestamp(date_from_unix_date((epoch95 + u($"id", 25, 2500) + 1).cast("int")))
        .as("l_shipdate")))

    // events.ts: LongType NANOSECONDS over a 30-day window (see header)
    val etypes = array(Seq("view", "click", "purchase", "signup",
      "error").map(lit): _*)
    val t0ns = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond * 1000000000L
    write("events", spark.range(nEvents).select(
      $"id".as("event_id"),
      (lit(t0ns) + u($"id", 26, 30L * 24 * 3600) * 1000000000L +
        u($"id", 27, 1000000000L)).as("ts"),
      u($"id", 28, nUsers).as("user_id"),
      element_at(etypes, u($"id", 29, 5).cast("int") + 1).as("event_type"),
      (u($"id", 30, 60000).cast("double") / 100).as("value"),
      concat(lit("{\"k\": "), u($"id", 31, 100), lit("}")).as("props")))

    // documents: driver vocabulary, 10-100 tokens, en-heavy langs.
    //
    // Two realism properties matter for the dedup/similarity workload:
    //  - VOCABULARY DIVERSITY scales with corpus size (Heaps' law). At the
    //    driver's 31-word vocab, 10x the docs would make every MinHash
    //    bucket quadratically denser with FALSE candidates — unlike any
    //    real corpus. Above sf 0.3, 70% of tokens get a digit suffix
    //    (vocab 31 → ~310), keeping bucket occupancy realistic while the
    //    base words keep the stopword/quality distributions recognizable.
    //  - PLANTED DUPLICATES: real corpora contain them (the driver data
    //    has exact-dup texts and verified near-dup pairs); independent
    //    random docs have none. 0.2% of docs are exact copies of a recent
    //    parent, 2% are near-copies with ~5% of token positions re-rolled.
    val vocab = array(Seq("a", "agg", "batch", "big", "column", "customer",
      "data", "dup", "fast", "filter", "group", "hash", "join", "key",
      "line", "merge", "order", "part", "query", "row", "scan", "slow",
      "small", "sort", "spark", "stream", "table", "the", "value", "vector",
      "window").map(lit): _*)
    val langs = array(Seq("en", "en", "en", "de", "es", "fr", "zh").map(lit): _*)
    val diverse = sf >= 0.3
    def tokAt(doc: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) = {
      val bare = element_at(vocab, pmod(h(lit(33), doc, i), lit(31)).cast("int") + 1)
      if (!diverse) bare
      else when(pmod(h(lit(45), doc, i), lit(10)) < 3, bare)
        .otherwise(concat(bare, pmod(h(lit(46), doc, i), lit(10))))
    }
    val dupKind = u($"id", 40, 1000)
    val hasParent = $"id" >= 1000
    val isExact = (dupKind < 2) && hasParent
    val isNear = (dupKind >= 2) && (dupKind < 22) && hasParent
    val parent = $"id" - 1 - pmod(h(lit(41), $"id"), lit(1000))
    val base = when(isExact || isNear, parent).otherwise($"id")
    val docs = spark.range(nDocs)
      .select($"id", base.as("base"), isNear.as("is_near"))
      .select(
        $"id".as("doc_id"),
        concat_ws(" ", transform(
          sequence(lit(1), (u($"base", 32, 91) + 10).cast("int")),
          i => when($"is_near" && pmod(h(lit(42), $"id", i), lit(20)) === 0,
            tokAt($"id", i)).otherwise(tokAt($"base", i))))
          .as("text"),
        element_at(langs, u($"id", 34, 7).cast("int") + 1).as("lang"),
        concat(lit("src"), u($"id", 35, 20)).as("source"))
    write("documents", docs.withColumn("n_chars", length($"text").cast("long")))

    // embeddings: 64 dims, 10 weak label clusters (center ±0.1, noise
    // ±0.15); 1% planted near-dup vectors (parent's vector + ±0.001 noise,
    // same label) so embedding-cosine near-dup search has true positives
    val isDupV = (u($"id", 50, 100) < 1) && ($"id" >= 100)
    val vbase = when(isDupV, $"id" - 1 - pmod(h(lit(51), $"id"), lit(100)))
      .otherwise($"id")
    write("embeddings", spark.range(nVecs)
      .select($"id", vbase.as("vb"), isDupV.as("is_dup"))
      .select(
        $"id".as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          ((pmod(h(lit(36), u($"vb", 37, 10), d), lit(2001)).cast("double") - 1000) / 10000 +
           (pmod(h(lit(38), $"vb", d), lit(3001)).cast("double") - 1500) / 10000 +
           when($"is_dup",
             (pmod(h(lit(52), $"id", d), lit(201)).cast("double") - 100) / 100000)
             .otherwise(lit(0.0)))
            .cast("float")).as("embedding"),
        u($"vb", 37, 10).cast("int").as("label")))

    println(s"[gen] done: $outDir at sf=$sf")
    spark.stop()
  }
}
