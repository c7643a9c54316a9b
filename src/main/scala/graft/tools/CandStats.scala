package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Candidate-volume observability for the e2 jaccard family: per-SF
  * shingle counts, LSH candidate-pair counts per banding config, and
  * how many of those candidates the exact verify keeps at the registry
  * threshold — the numbers that attribute superlinear growth to data
  * density vs banding without a profiling session.
  *
  *   sbt "runMain graft.tools.CandStats /root/testdata/sf0.01 [b,r b,r ...]"
  *
  * Prints one JSON line per banding config. The default config list
  * contrasts the legacy single-row banding (bands=4, rows=1 — candidate
  * probability ≈ bands·s, so background pairs at any similarity s leak
  * in proportionally and candidate mass tracks n²) with multi-row
  * bands (probability bands·s^rows — background suppressed by s^(rows-1)).
  */
object CandStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val configs: Seq[(Int, Int)] =
      if (args.length > 1)
        args.drop(1).toSeq.map { a =>
          val Array(b, r) = a.split(","); (b.toInt, r.toInt)
        }
      else Seq((4, 1), (4, 2), (6, 2), (8, 2))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionProfile.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    // the corpus-DERIVED family (lshParamsFor) always rides along, so
    // every CandStats run contrasts fixed configs with the one the
    // auto entry point would pick at this corpus size
    val derived = DedupOps.lshParamsFor(nDocs)
    val all = (configs :+ derived).distinct
    val shingles = DedupOps.docShingles(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nShingles = shingles.count()
    all.foreach { case (bands, rows) =>
      val t0 = System.nanoTime()
      val pairs = DedupOps.jaccardVerifiedPairs(docs, "doc_id", "text",
        bands = bands, thresholdMicro = 0, rows = rows)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nCand = pairs.count()
      val nVerified = pairs.where(col("jaccard_micro") >= 200000).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(
        s"""{"sf":"$sfDir","bands":$bands,"rows":$rows,"n_docs":$nDocs,""" +
        s""""derived":${(bands, rows) == derived},""" +
        s""""n_shingles":$nShingles,"candidate_pairs":$nCand,""" +
        s""""verified_pairs_200k":$nVerified,"sec":${f"$sec%.2f"}}""")
      pairs.unpersist(blocking = false)
    }
    spark.stop()
  }
}
