package graft.sinks

import org.apache.spark.sql.DataFrame

import java.nio.file.Paths

/** O18a/O18c — parquet write + output path derivation
  * (reference: cna/writer.go:14-58; cna/transformer.go:266-297;
  * cmd/cli/main.go:198-237,561-579).
  *
  * Snappy is Spark's default parquet codec, matching the reference
  * (cna/writer.go:27). `singleFile=true` reproduces the reference's
  * one-file-per-table layout via coalesce(1) — correct for study-sized
  * outputs; at 100 TB leave it false and let each partition write its split.
  */
object ParquetSink {

  def write(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").parquet(path)
  }

  /** O18c: per-study output path — `<studyDir>_<dataFileBase>_<suffix>.parquet`
    * (cna/transformer.go:266-297). */
  def derivePath(dataFilePath: String, suffix: String): String = {
    val p = Paths.get(dataFilePath)
    val studyDir = Option(p.getParent).map(_.getFileName.toString).getOrElse("")
    val base = p.getFileName.toString.replaceAll("\\.txt$", "")
    val dir = Option(p.getParent).map(_.toString).getOrElse(".")
    s"$dir/${studyDir}_${base}_$suffix.parquet"
  }

  /** Combined output path — `<base>_<suffix>.parquet` (cmd/cli/main.go:561-579). */
  def combinedPath(outputDir: String, base: String, suffix: String): String =
    s"$outputDir/${base}_$suffix.parquet"
}
