package graft.pipelines

import graft.core.{StudyDiscovery, TsvReader}
import graft.operators.{CnaOps, CombineOps, MutationOps}
import graft.sinks.ParquetSink
import org.apache.spark.sql.SparkSession

/** The reference's six CLI modes re-expressed as Spark jobs
  * (cmd/cli/main.go:45-109; README.md:3-61):
  * convert-cna, convert-cna-with-derived, convert-mutations,
  * combine-cna, combine-cna-with-derived, combine-mutations.
  */
object Pipelines {

  /** convert-cna[-with-derived] (cmd/cli/main.go:111-151): per discovered CNA
    * matrix file, write genetic_alteration + genetic_profile_samples
    * (+ derived). Fails fast on first file error, like the reference
    * (cna/transformer.go:36-38). Files are independent → Spark schedules
    * their jobs' tasks across the cluster; no cross-file state.
    */
  def convertCna(spark: SparkSession, rootDir: String,
      withDerived: Boolean = false, singleFile: Boolean = true): Seq[String] = {
    StudyDiscovery.findCnaFiles(rootDir).flatMap { f =>
      val df = TsvReader.readTsv(spark, f.path)
      val gaPath = ParquetSink.derivePath(f.path, "genetic_alterations")
      val gpsPath = ParquetSink.derivePath(f.path, "genetic_profile_samples")
      ParquetSink.write(
        CnaOps.packGeneCentric(df, f.cancerStudyId, f.geneticProfileId),
        gaPath, singleFile)
      ParquetSink.write(
        CnaOps.sampleList(spark, df.columns.toSeq, f.cancerStudyId, f.geneticProfileId),
        gpsPath, singleFile)
      val derived = if (withDerived) {
        val dPath = ParquetSink.derivePath(f.path, "derived")
        ParquetSink.write(
          CnaOps.unpivotDerived(df, f.cancerStudyId, f.geneticProfileId),
          dPath, singleFile)
        Seq(dPath)
      } else Nil
      Seq(gaPath, gpsPath) ++ derived
    }
  }

  /** convert-mutations (cmd/cli/main.go:396-424): per discovered MAF, write
    * mutation_event + mutation with MUTATION_EVENT_ID contiguous across files
    * (mutation/transformer.go:30-52). Per-file failure tolerance: failures
    * are collected and reported after all files process, like the reference
    * (:44-49,60-71).
    *
    * Cross-file contiguity without serializing the files: a first metadata
    * pass counts rows per file (cheap column-pruned scans) to compute per-file
    * offsets, then each file transforms independently with its offset —
    * restoring file parallelism the reference gives up (SURVEY.md §3.2).
    */
  def convertMutations(spark: SparkSession, rootDir: String,
      singleFile: Boolean = true): Seq[String] = {
    val files = StudyDiscovery.findMutationFiles(rootDir)
    val counts = files.map { f =>
      try f.path -> TsvReader.readMaf(spark, f.path).count()
      catch { case e: Exception => System.err.println(
        s"[convert-mutations] count failed for ${f.path}: ${e.getMessage}"); f.path -> -1L }
    }.toMap
    val offsets = files.filter(f => counts(f.path) >= 0)
      .scanLeft(("", 0L, 0L)) { case ((_, off, n), f) =>
        (f.path, off + n, counts(f.path))
      }.drop(1).map { case (p, off, _) => p -> off }.toMap
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val written = files.flatMap { f =>
      if (!offsets.contains(f.path)) { failures += f.path; Nil }
      else try {
        val df = TsvReader.readMaf(spark, f.path)
        val (events, mutations) =
          MutationOps.transformMaf(df, f.cancerStudyId, f.geneticProfileId,
            startEventId = offsets(f.path))
        val evPath = ParquetSink.derivePath(f.path, "mutation_event")
        val muPath = ParquetSink.derivePath(f.path, "mutation")
        ParquetSink.write(events, evPath, singleFile)
        ParquetSink.write(mutations, muPath, singleFile)
        Seq(evPath, muPath)
      } catch {
        case e: Exception =>
          System.err.println(s"[convert-mutations] ${f.path} failed: ${e.getMessage}")
          failures += f.path; Nil
      }
    }
    if (failures.nonEmpty)
      throw new RuntimeException(
        s"convert-mutations: ${failures.size} file(s) failed: ${failures.mkString(", ")}")
    written
  }

  /** combine-* (cmd/cli/main.go:153-196,538-559): per table kind, glob the
    * per-study parquet files and union-all into one combined file, excluding
    * the output itself from the inputs. */
  def combine(spark: SparkSession, dir: String, outputBase: String,
      suffixes: Seq[String], singleFile: Boolean = true): Seq[String] = {
    suffixes.map { suffix =>
      val out = ParquetSink.combinedPath(dir, outputBase, suffix)
      val df = CombineOps.combineGlob(spark, s"$dir/*_$suffix.parquet", out)
      ParquetSink.write(df, out, singleFile)
      out
    }
  }

  val cnaSuffixes = Seq("genetic_alterations", "genetic_profile_samples")
  val cnaDerivedSuffixes: Seq[String] = cnaSuffixes :+ "derived"
  val mutationSuffixes = Seq("mutation_event", "mutation")
}
