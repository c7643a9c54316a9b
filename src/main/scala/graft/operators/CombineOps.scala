package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** O18b — parquet combine: N per-study files → one table, union-all
  * (reference: cna/reader_parquet.go:87-143).
  *
  * The reference streams file-by-file through one channel, assumes schema
  * compatibility by position from the first batch, loads each file fully into
  * memory (:60 `ReadTable` — a scale bug), and silently truncates on read
  * error (:132-137 — a correctness bug). Here: `unionByName` is stricter
  * (name-matched, errors on mismatch unless told otherwise), reads stream
  * row-group-at-a-time via the vectorized reader, and any failure fails the
  * job. A multi-file `spark.read.parquet(paths:_*)` is the degenerate case
  * when schemas are identical — one scan node, partition-parallel.
  */
object CombineOps {

  /** Combine explicit paths. `allowMissingColumns` fills absent columns with
    * null instead of erroring (schema drift across study files). */
  def combine(spark: SparkSession, paths: Seq[String],
      allowMissingColumns: Boolean = false): DataFrame = {
    require(paths.nonEmpty, "combine: no input paths")
    paths.map(spark.read.parquet(_))
      .reduce(_.unionByName(_, allowMissingColumns))
  }

  /** Combine a glob, excluding the output path from the inputs (the
    * reference writes its combined file next to the inputs and must
    * self-exclude — cna/reader_parquet.go:101-108). Matching is driver-side
    * file listing (metadata, not data). */
  def combineGlob(spark: SparkSession, pattern: String, excludePath: String = "")
      : DataFrame = {
    import java.nio.file.{FileSystems, Files, Paths}
    import scala.jdk.CollectionConverters._
    val p = Paths.get(pattern)
    val matcher = FileSystems.getDefault.getPathMatcher(
      "glob:" + p.getFileName.toString)
    val stream = Files.list(p.getParent)
    val files =
      try stream.iterator().asScala
        .filter(f => matcher.matches(f.getFileName))
        .map(_.toString)
        .filterNot(_ == excludePath)
        .toSeq.sorted
      finally stream.close()
    combine(spark, files)
  }
}
