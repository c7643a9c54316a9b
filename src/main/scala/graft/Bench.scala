package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
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
      spark.range(8000000L).selectExpr("sum(id * id)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    probe() // JIT the probe path itself before sampling
    val probesBefore = (1 to 5).map(_ => probe())
    // best-of-2 per query: this VM shows multi-x hypervisor/GC noise on
    // single shots; the second run measures steady state (plans are fresh
    // per call — only JIT/codegen caches persist, as they would in any
    // long-running Spark application)
    // A crashing query must NOT benchmark as fast: record the error string
    // in place of a time, print every failure to stderr, and exit non-zero.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          errors.getOrElseUpdate(name,
            Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          None
        }
      }
      name -> times.minOption
    }
    val probesAfter = (1 to 5).map(_ => probe())
    val probes = probesBefore ++ probesAfter
    val probeSpread = probes.max / probes.min
    val contended = probeSpread > 2.0
    val qs = results.map {
      case (k, Some(v)) => s"\"" + k + "\":" + v
      case (k, None) =>
        s"\"" + k + "\":\"err: " + errors(k).replaceAll("[\"\\\\\n\r\t]", " ") + "\""
    }.mkString("{", ",", "}")
    val total = results.values.flatten.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","errors":${errors.size},""" +
      s""""probe_sec":${f"${probes.min}%.3f"},"probe_spread":${f"$probeSpread%.2f"},"contended":$contended}"""
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
