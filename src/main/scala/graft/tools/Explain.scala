package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of a registry query and time
  * two executions (cold + warm).
  *
  *   sbt "runMain graft.tools.Explain e2_minhash_pairs [/root/testdata/sf0.1]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = name match {
      // dev probes for sub-stages not in the registry
      case "dev:ivf_hits" =>
        // recall@10 probe for the label-IVF baseline vs brute force
        import org.apache.spark.sql.functions.col
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val q = emb.where(col("vec_id") === 0)
          .select(col("embedding")).head.getSeq[Float](0)
        val ivf = graft.operators.SimilarityOps
          .topKIvf(emb, "vec_id", "embedding", "label", q, k = 10, nprobe = 3)
          .select(col("vec_id").as("ivf_id"))
        graft.operators.SimilarityOps
          .topKCosine(emb, "vec_id", "embedding", q, k = 10)
          .join(ivf, col("vec_id") === col("ivf_id"), "left_semi")
      case "dev:minhash_bands" =>
        graft.operators.DedupOps.minhashBands(
          spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", 4)
      case _ => SparkEntry.queries(name)(spark, sfDir)
    }
    df.explain("formatted")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[explain] run$i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    if (sys.env.contains("SPARK_GRAFT_SHOW") || args.contains("show"))
      df.show(100, truncate = false)
    spark.stop()
  }
}
