package graft

/** Long-lived-session cache hygiene. The registry's expensive shared
  * stages are persisted with NEXT-CALL-RELEASE memos (tfidf tf relation,
  * e10 pipeline stages, jaccard shingles, semantic-dedup cells, o16's
  * sorted InternalRow RDD): each invocation unpersists its predecessor's
  * caches, so a service looping over the same queries holds a BOUNDED
  * cache set — and `SparkEntry.releaseCaches()` empties even that bound
  * once the last results are materialized. Without the memos, a
  * 100-query loop accumulates dead multi-million-row caches until
  * storage memory evicts working sets (the CacheManager holds
  * registered entries forever; the ContextCleaner only reclaims
  * UNregistered ones). */
class CacheLifecycleSpec extends SparkSpec {

  test("3 invocation rounds hold a bounded cache set; releaseCaches empties it") {
    val dir = sf("0.001")
    // clean baseline: suites share one JVM-wide session, so earlier
    // suites' leftovers must not count against this contract
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)

    // one query per memo family, plus the per-JVM layout memos (o21)
    val names = Seq("e4_tfidf", "e2_jaccard_pairs", "e2_semantic_dedup",
      "e10_clean_pipeline", "o16_seq_id", "o21_ann_partitioned")
    val sizes = (1 to 3).map { _ =>
      names.foreach(n => SparkEntry.queries(n)(spark, dir).count())
      spark.sparkContext.getPersistentRDDs.size
    }
    // bounded: the live-cache count never GROWS across rounds — every
    // call released its predecessor's persists (round 1 may carry a few
    // one-time setup persists that later rounds shed, so the contract is
    // non-increase, not equality; accumulation would read as a strictly
    // rising sequence)
    assert(sizes(1) <= sizes(0) && sizes(2) <= sizes(1),
      s"cache count grew across rounds: $sizes")
    assert(sizes.last > 0, "expected the memo families to hold live caches")

    SparkEntry.releaseCaches()
    // unpersist(blocking=false) deregisters synchronously (only the
    // executor-side block cleanup is async), so both maps read empty now
    assert(spark.sharedState.cacheManager.isEmpty)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      spark.sparkContext.getPersistentRDDs.values.map(_.toString).toSeq.toString)

    // released memos stay USABLE: the next invocation simply rebuilds
    val again = SparkEntry.queries("e4_tfidf")(spark, dir).count()
    assert(again > 0)
    SparkEntry.releaseCaches()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("invalidateLayouts forces the next invocation to rewrite the layout") {
    val dir = sf("0.001")
    def bucketedMtime(): Long = {
      // the conf value is a file: URI in-session even when set as a path
      val raw = spark.conf.get("spark.sql.warehouse.dir")
      val wh = new java.io.File(new java.net.URI(
        if (raw.startsWith("file:")) raw else "file://" + raw).getPath)
      wh.listFiles().filter(_.getName.startsWith("g_orders_b_"))
        .map(_.lastModified()).max
    }
    val r1 = SparkEntry.queries("o20_bucketed_join")(spark, dir).collect()
    val t1 = bucketedMtime()
    // memoized: a second call reuses the layout (no rewrite, mtime fixed)
    SparkEntry.queries("o20_bucketed_join")(spark, dir).count()
    assert(bucketedMtime() == t1, "memoized call must not rewrite the layout")
    Thread.sleep(1100) // mtime granularity
    SparkEntry.invalidateLayouts()
    val r2 = SparkEntry.queries("o20_bucketed_join")(spark, dir).collect()
    assert(bucketedMtime() > t1, "invalidation must trigger a fresh layout write")
    assert(r1.toSeq == r2.toSeq, "rewritten layout must serve identical results")
  }
}
