package graft.tools

import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measure the driver-union-find vs distributed-pointer-jumping
  * crossover of DedupOps.connectedComponents on synthetic candidate
  * graphs of controlled shape and size.
  *
  *   sbt "runMain graft.tools.CcBench <edges1> <edges2> ..."
  *   (default sizes: 500k 1M 2M 4M 8M)
  *
  * Graph shape mirrors what LSH candidate graphs actually look like:
  * 90% of edges in small cliques (near-dup groups: all-pairs within a
  * bucket, diameter 1) and 10% in long chains (drifting-duplicate runs,
  * diameter = chain length — the worst case for label propagation, the
  * reason the pointer-jumping jump join exists). Both paths run on the
  * SAME edge list and must produce identical clusterings (asserted via
  * checksum) — the timing comparison is only meaningful if both answers
  * are right.
  */
object CcBench {

  private def cliqueEdges(spark: SparkSession, nCliques: Long,
      k: Int, idBase: Long): DataFrame = {
    val offs = for (i <- 0 until k; j <- i + 1 until k) yield (i, j)
    val pairArr = array(offs.map { case (i, j) =>
      struct(lit(i).as("i"), lit(j).as("j")) }: _*)
    spark.range(nCliques).select((col("id") * k + idBase).as("base"))
      .select(col("base"), explode(pairArr).as("p"))
      .select((col("base") + col("p.i")).as("id_a"),
        (col("base") + col("p.j")).as("id_b"))
  }

  private def chainEdges(spark: SparkSession, nNodes: Long,
      chainLen: Int, idBase: Long): DataFrame =
    spark.range(nNodes - 1)
      .where(col("id") % chainLen =!= (chainLen - 1)) // break between chains
      .select((col("id") + idBase).as("id_a"),
        (col("id") + idBase + 1).as("id_b"))

  /** Order-insensitive clustering checksum: sum over vertices of
    * hash(vertex, cluster), each term bounded so 8M+ terms cannot
    * overflow Long under ANSI mode. */
  private def checksum(cc: DataFrame): Long =
    cc.agg(sum(pmod(xxhash64(col("doc_id"), col("cluster_id")),
      lit(1000000000L)))).head.getLong(0)

  def main(args: Array[String]): Unit = {
    val sizes: Seq[Long] =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(500000L, 1000000L, 2000000L, 4000000L, 8000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionProfile.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // session warmup

    val k = 20 // clique size → k(k-1)/2 = 190 edges per clique
    val chainLen = 1000
    val rows = sizes.map { target =>
      val cliqueBudget = (target * 9) / 10
      val nCliques = math.max(1L, cliqueBudget / (k * (k - 1) / 2))
      val chainNodes = math.max(2L, target - nCliques * (k * (k - 1) / 2))
      val edges = cliqueEdges(spark, nCliques, k, 0L)
        .union(chainEdges(spark, chainNodes, chainLen, nCliques * k + 1000000000L))
        .localCheckpoint(true) // materialize: generation cost stays out of timings
      val nEdges = edges.count()

      def time(f: => DataFrame): (Double, Long) = {
        val t0 = System.nanoTime()
        val df = f
        val cs = checksum(df) // forces full execution
        ((System.nanoTime() - t0) / 1e9, cs)
      }
      // driver union-find (limit above nEdges) vs distributed (limit 0)
      val (tDriver, csDriver) = time(
        DedupOps.connectedComponents(edges, driverEdgeLimit = Long.MaxValue))
      val (tDist, csDist) = time(
        DedupOps.connectedComponents(edges, driverEdgeLimit = 0L))
      val rounds = DedupOps.lastCcRounds
      assert(csDriver == csDist,
        s"clustering mismatch at $nEdges edges: $csDriver vs $csDist")
      println(f"[ccbench] edges=$nEdges%d driver=$tDriver%.2fs distributed=$tDist%.2fs rounds=$rounds ratio=${tDist / tDriver}%.2f")
      s"""{"edges":$nEdges,"driver_sec":${f"$tDriver%.3f"},"distributed_sec":${f"$tDist%.3f"},"rounds":$rounds}"""
    }
    println("[ccbench] " + rows.mkString("[", ",", "]"))
    spark.stop()
  }
}
