package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measurement (guide §1): decompose ONE registry query's wall time
  * into Spark jobs vs driver-side gaps. For a lifecycle query the
  * per-job histogram shows whether the cost is a few real stages or
  * many tiny actions (commit counts, stats probes, trigger drains) —
  * the latter means the lever is fewer/lighter actions, not plan shape.
  *
  *   sbt "runMain graft.tools.QueryProfile <query> [sfDir] [runs]"
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("o67_cdc_apply_mor")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = graft.SessionProfile.tune(SparkSession.builder())
      .master("local[32]").appName("query-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    // warm: JIT, codegen cache, page cache
    fn(spark, sfDir).count()
    spark.catalog.clearCache()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val done = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, String, Int)]()
    // listener-bus thread writes, main thread reads after the bus
    // drains — atomics so the totals are never stale or torn
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskTotal = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse(js.stageInfos.headOption.map(_.name).getOrElse(""))
        jobs.put(js.jobId, (js.time, desc, js.stageIds.size))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, desc, ns) =>
          done.synchronized { done += ((je.jobId, t0, je.time, desc, ns)) }
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskTotal.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
        ()
      }
    }
    (1 to runs).foreach { r =>
      done.synchronized(done.clear()); jobs.clear()
      stages.set(0); taskTotal.set(0)
      spark.sparkContext.addSparkListener(listener)
      val w0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wallMs = (System.nanoTime() - w0) / 1000000
      org.apache.spark.sql.graft.Bridge.waitListenerBusEmpty(spark)
      spark.sparkContext.removeSparkListener(listener)
      val snap = done.synchronized(done.sortBy(_._1).toVector)
      val jobMs = snap.map(j => j._3 - j._2).sum
      println(f"== $name run $r: wall ${wallMs}ms, jobs ${snap.size} (sum ${jobMs}ms), stages ${stages.get}, task-run-time ${taskTotal.get}ms, driver-gap ${wallMs - jobMs}ms")
      if (r == runs) {
        // gap analysis: time between consecutive job ends and starts
        var prevEnd = 0L
        snap.foreach { case (id, t0, t1, desc, ns) =>
          val gap = if (prevEnd == 0) 0 else t0 - prevEnd
          prevEnd = t1
          println(f"  job $id%3d ${t1 - t0}%5dms gap=$gap%5dms stages=$ns ${desc.take(90)}")
        }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
