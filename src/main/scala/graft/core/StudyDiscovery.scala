package graft.core

import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** O5/O6/O7 — cBioPortal datahub study discovery: recursive walk with
  * filename predicates, meta key-value parsing, and meta↔data pairing
  * (reference: cmd/cli/main.go:239-349 CNA, :426-536 mutations, :352-394 meta).
  *
  * File *listing* is driver-side metadata work (the reference walks the tree
  * in-process too); the data files themselves are read distributed. Unlike the
  * reference — which iterates a Go map and therefore pairs files in randomized
  * order (cmd/cli/main.go:309,496) — we sort discovered files by path so runs
  * are deterministic (SURVEY.md §1.5.3).
  */
object StudyDiscovery {

  /** One discovered data file with its (possibly empty) study/profile ids.
    * Mirrors CNAFileInput / MutationFileInput (cna/transformer.go:16-21). */
  final case class StudyFile(
      path: String,
      cancerStudyId: String,
      geneticProfileId: String)

  /** Parsed meta_*.txt (cmd/cli/main.go:352-394). */
  final case class Meta(
      cancerStudyIdentifier: String,
      stableId: String,
      dataFilename: String)

  // Filename predicates, lowercased match (cmd/cli/main.go:271-272, 297-298, 458, 484).
  private val metaCna = "^meta_.*cna.*\\.txt$".r
  private val dataCna = "^data_.*cna.*\\.txt$".r
  private val metaMut = "^meta_mutations.*\\.txt$".r
  private val dataMut = "^data_mutations.*\\.txt$".r

  private def isMetaCna(n: String) = metaCna.matches(n) && !n.contains("seg")
  private def isDataCna(n: String) = dataCna.matches(n) && !n.contains("seg")

  /** O6: line-oriented `key: value` parse; `#` and blank lines skipped;
    * early-exits once all three keys are found (cmd/cli/main.go:383-386). */
  def parseMeta(path: Path): Meta = {
    var study, stable, dataFile = ""
    val lines = Files.readAllLines(path).asScala.iterator
    while (lines.hasNext && (study.isEmpty || stable.isEmpty || dataFile.isEmpty)) {
      val line = lines.next().trim
      if (line.nonEmpty && !line.startsWith("#")) {
        val idx = line.indexOf(':')
        if (idx > 0) {
          val (k, v) = (line.substring(0, idx).trim, line.substring(idx + 1).trim)
          k match {
            case "cancer_study_identifier" => study = v
            case "stable_id"               => stable = v
            case "data_filename"           => dataFile = v
            case _                         =>
          }
        }
      }
    }
    Meta(study, stable, dataFile)
  }

  /** O5+O7: walk `rootDir` (skipping any `case_lists` subtree —
    * cmd/cli/main.go:257-262), collect meta/data files matching the given
    * predicates, then left-outer pair data files with their meta by
    * `dir/data_filename` key (cmd/cli/main.go:285-293,324-337). Data files
    * without a meta proceed with empty ids (reference warns + continues). */
  private def discover(
      rootDir: String,
      isMeta: String => Boolean,
      isData: String => Boolean): Seq[StudyFile] = {
    val metas = mutable.Map.empty[String, Meta]
    val dataFiles = mutable.ArrayBuffer.empty[Path]
    val stream = Files.walk(Paths.get(rootDir))
    try {
      stream.iterator().asScala.foreach { p =>
        val inCaseLists =
          (0 until p.getNameCount).exists(i => p.getName(i).toString == "case_lists")
        if (!inCaseLists && Files.isRegularFile(p)) {
          val name = p.getFileName.toString.toLowerCase
          if (isMeta(name)) {
            val m = parseMeta(p)
            if (m.dataFilename.nonEmpty)
              metas(p.getParent.resolve(m.dataFilename).toString) = m
          } else if (isData(name)) dataFiles += p
        }
      }
    } finally stream.close()
    dataFiles.sortBy(_.toString).toSeq.map { p =>
      metas.get(p.toString) match {
        case Some(m) =>
          // genetic_profile_id = study + "_" + stable_id (cmd/cli/main.go:334-337)
          StudyFile(p.toString, m.cancerStudyIdentifier,
            s"${m.cancerStudyIdentifier}_${m.stableId}")
        case None => StudyFile(p.toString, "", "")
      }
    }
  }

  def findCnaFiles(rootDir: String): Seq[StudyFile] =
    discover(rootDir, isMetaCna, isDataCna)

  def findMutationFiles(rootDir: String): Seq[StudyFile] =
    discover(rootDir, n => metaMut.matches(n), n => dataMut.matches(n))
}
