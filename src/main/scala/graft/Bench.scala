package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SessionProfile.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session once (scheduler, codegen, parquet reader init) so the
    // first measured query isn't charged for JVM/session startup
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // CONTENTION GUARD: a fixed CPU-bound probe timed before and after the
    // run. On a quiet machine its 10 samples are tight; hypervisor /
    // noisy-neighbor interference shows up as a wide max/min spread, and
    // the artifact flags itself (`contended`) instead of passing off
    // inflated per-query numbers as regressions (this VM has shown 3-70s
    // swings on identical plans — see DEVNOTES).
    def probe(): Double = {
      val t0 = System.nanoTime()
      // CPU-bound, overflow-safe (bounded pmod terms under ANSI mode)
      spark.range(8000000L).selectExpr("sum(pmod(xxhash64(id), 1000))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // Each sampling POINT takes min-of-3: a single probe shot also measures
    // whatever trails the preceding queries (GC, shuffle cleanup) and JIT
    // residue; the min filters one-off noise while interference sustained
    // across the point's ~0.3s still shows. JIT-warm the path first:
    // measured runs show the first shots 2-3x slower purely from
    // compilation, which would masquerade as "contention".
    def probePoint(): Double = (1 to 3).map(_ => probe()).min
    // I/O-STACK probe: a fixed single-column parquet scan. Paired with
    // the CPU probe it SEPARATES drift components — a contended run
    // with a quiet CPU probe but an inflated I/O probe is storage-side
    // interference (host page-cache pressure, noisy-neighbor disk),
    // not scheduler steal; both quiet + queries inflated = a real
    // regression. (Page cache holds the file after the first read, so
    // this measures the read PATH — footer parse, page decode — which
    // is exactly the stack every scan shares.)
    def ioProbe(): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .selectExpr("count(l_orderkey)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    def ioProbePoint(): Double = (1 to 3).map(_ => ioProbe()).min
    (1 to 8).foreach(_ => probe())
    (1 to 3).foreach(_ => ioProbe())
    val probesBefore = (1 to 3).map(_ => probePoint())
    val ioBefore = (1 to 3).map(_ => ioProbePoint())
    val ioMid = scala.collection.mutable.ArrayBuffer[Double]()
    // best-of-2 per query: this VM shows multi-x hypervisor/GC noise on
    // single shots; the second run measures steady state (plans are fresh
    // per call — only JIT/codegen caches persist, as they would in any
    // long-running Spark application)
    // A crashing query must NOT benchmark as fast: record the error string
    // in place of a time, print every failure to stderr, and exit non-zero.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // mid-run probes: before/after sampling alone is blind to interference
    // that starts and ends INSIDE a 10-minute run (observed: a handful of
    // adjacent queries 10-30x their steady-state time while the end probes
    // read quiet) — so the probe also runs every 10 queries
    val probesMid = scala.collection.mutable.ArrayBuffer[Double]()
    var qIdx = 0
    // dev-only subset filter (comma-separated query names) for targeted
    // scale iteration; the driver never sets it → full registry
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(f) => SparkEntry.queries.filter { case (k, _) => f(k) }
      case None => SparkEntry.queries
    }
    // runs per query (default 2), taken as INTERLEAVED FULL PASSES over
    // the registry — pass 1 runs every query once, then pass 2 — so a
    // query's samples are minutes apart and one VM stall window can no
    // longer inflate both samples AND the min (back-to-back runs cost a
    // full adjudication session in r8). The artifact records EVERY
    // sample (`runs`, in pass order) next to the per-query min
    // (`queries`): a single inflated sample is a stall window, not a
    // regression, and the committed artifact should let a reader see
    // that without a re-run.
    val nRuns = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(2)
    val samples = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[Double]]()
    selected.keys.foreach(k =>
      samples(k) = scala.collection.mutable.ArrayBuffer[Double]())
    (1 to nRuns).foreach { _ =>
      selected.foreach { case (name, fn) =>
        // a query that already failed deterministically is not retried
        // (its error is the result; re-running would only burn pass time)
        if (!errors.contains(name)) {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count()
            samples(name) += (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            errors.getOrElseUpdate(name,
              Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          }
          // isolate queries from each other's leftover Dataset caches
          // (the per-query persists have next-call-release lifecycles,
          // but in a 100-query loop "next call" can be minutes of GC
          // pressure away — a fresh application would not carry them, so
          // neither does the measurement; RDD-level persists like o16's
          // memo are unaffected)
          spark.catalog.clearCache()
          qIdx += 1
          if (qIdx % 10 == 0) { probesMid += probePoint()
            ioMid += ioProbePoint() }
        }
      }
    }
    val results = samples.map { case (k, ts) => k -> ts.toSeq }
    val probesAfter = (1 to 3).map(_ => probePoint())
    val ioAfter = (1 to 3).map(_ => ioProbePoint())
    val probes = probesBefore ++ probesMid ++ probesAfter
    val ioProbes = ioBefore ++ ioMid ++ ioAfter
    // VERDICT: trimmed spread (2nd-min to 2nd-max) over the MID+AFTER
    // sampling points only. The before-points are excluded — a fresh JVM's
    // probe starts ~2x slow and settles over minutes (C2 tiering, heap
    // sizing) no matter how much quick warmup runs, which reads as fake
    // "drift". Threshold 3x sits above this VM's measured quiet-run jitter
    // (~2.5x across a 10-minute window) and far below the 10-30x mid-run
    // swings of a genuinely contended run. Cross-run slowdown is judged by
    // comparing probe_sec (the floor) between artifacts instead.
    def trimmedSpread(xs: Seq[Double]) = { val s = xs.sorted; s(s.size - 2) / s(1) }
    val probeSpread = trimmedSpread((probesMid ++ probesAfter).toSeq)
    val ioSpread = trimmedSpread((ioMid ++ ioAfter).toSeq)
    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val medianDrift = median(probesAfter) / median(probesBefore)
    val contended = probeSpread > 3.0
    val qs = results.map {
      case (k, ts) if ts.nonEmpty => s"\"" + k + "\":" + ts.min
      case (k, _) =>
        s"\"" + k + "\":\"err: " + errors(k).replaceAll("[\"\\\\\n\r\t]", " ") + "\""
    }.mkString("{", ",", "}")
    // every sample per query, in run order — `queries` above is the min
    val runsJson = results.collect { case (k, ts) if ts.nonEmpty =>
      s"\"" + k + "\":" + ts.map(t => f"$t%.4f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.values.collect { case ts if ts.nonEmpty => ts.min }.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","errors":${errors.size},""" +
      s""""runs_per_query":$nRuns,"runs":$runsJson,""" +
      s""""probe_sec":${f"${probes.min}%.3f"},"probe_spread":${f"$probeSpread%.2f"},""" +
      s""""probe_samples":${probes.map(p => f"$p%.3f").mkString("[", ",", "]")},""" +
      s""""probe_median_drift":${f"$medianDrift%.2f"},""" +
      s""""io_probe_sec":${f"${ioProbes.min}%.3f"},"io_probe_spread":${f"$ioSpread%.2f"},""" +
      s""""io_probe_samples":${ioProbes.map(p => f"$p%.3f").mkString("[", ",", "]")},""" +
      s""""contended":$contended}"""
    println(json)
    // self-describing artifact: preserve the run (and its contention
    // verdict) independent of whoever captured stdout
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    if (contended) System.err.println(
      f"[bench] CONTENDED: probe spread $probeSpread%.2fx (min ${probes.min}%.3fs max ${probes.max}%.3fs) — treat per-query times with suspicion")
    errors.foreach { case (n, m) => System.err.println(s"[bench] FAILED $n: $m") }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
