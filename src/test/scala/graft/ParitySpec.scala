package graft

import graft.core.{Schemas, StudyDiscovery, TsvReader}
import graft.operators.{CnaOps, CombineOps, MutationOps}
import graft.pipelines.Pipelines

import java.nio.file.{Files, Paths}

/** Reference-parity golden tests over the FIXTURES.md §A miniature studies.
  * Goldens are hand-computed from the reference's transform semantics
  * (cna/transformer.go, mutation/transformer.go). */
class ParitySpec extends SparkSpec {

  val studies = "src/test/resources/studies"

  test("O5/O6/O7: discovery finds, pairs, skips case_lists, sorts") {
    val cna = StudyDiscovery.findCnaFiles(studies)
    assert(cna.map(f => Paths.get(f.path).getFileName.toString) == Seq("data_cna.txt"))
    assert(cna.head.cancerStudyId == "study_a")
    assert(cna.head.geneticProfileId == "study_a_gistic")

    val mut = StudyDiscovery.findMutationFiles(studies)
    assert(mut.size == 2) // study_a then study_b (path-sorted)
    assert(mut.map(_.cancerStudyId) == Seq("study_a", "study_b"))
    assert(mut.map(_.geneticProfileId) ==
      Seq("study_a_mutations", "study_b_mutations"))
    // nothing under case_lists is ever discovered
    assert(!cna.exists(_.path.contains("case_lists")))
    assert(!mut.exists(_.path.contains("case_lists")))
  }

  test("O1/O3: TSV read — all-string schema from header") {
    val df = TsvReader.readTsv(spark, s"$studies/study_a/data_cna.txt")
    assert(df.columns.toSeq ==
      Seq("Hugo_Symbol", "Entrez_Gene_Id", "TCGA-S1", "TCGA-S2", "TCGA-S3"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.count() == 2)
  }

  test("O2: MAF read skips # comments") {
    val df = TsvReader.readMaf(spark, s"$studies/study_a/data_mutations.txt")
    assert(df.count() == 3)
    assert(df.columns.contains("HGVSp_Short"))
  }

  test("O8: CNA pack — gene-centric VALUES in source column order") {
    val df = TsvReader.readTsv(spark, s"$studies/study_a/data_cna.txt")
    val ga = CnaOps.packGeneCentric(df, "study_a", "study_a_gistic")
    assert(ga.columns.toSeq == Schemas.geneticAlteration.fieldNames.toSeq)
    val rows = ga.collect().map(r => (r.getString(2), r.getString(3))).toSeq
    assert(rows == Seq("BRCA1" -> "0,-1,2", "TP53" -> "1,0,-2"))
    assert(ga.collect().forall(r =>
      r.getString(0) == "study_a" && r.getString(1) == "study_a_gistic"))
  }

  test("O9/O10: sample list — single row, prefixed, source order") {
    val df = TsvReader.readTsv(spark, s"$studies/study_a/data_cna.txt")
    val gps = CnaOps.sampleList(spark, df.columns.toSeq, "study_a", "study_a_gistic")
    val rows = gps.collect()
    assert(rows.length == 1) // the reference's 1-row assert (cna/transformer.go:553-560)
    assert(rows.head.getString(2) == "study_a_TCGA-S1,study_a_TCGA-S2,study_a_TCGA-S3")
  }

  test("O11: unpivot derived — 6 rows, reference column-major order reproducible") {
    val df = TsvReader.readTsv(spark, s"$studies/study_a/data_cna.txt")
    val d = CnaOps.unpivotDerived(df, "study_a", "study_a_gistic", withOrder = true)
    import org.apache.spark.sql.functions.col
    val ordered = d.orderBy(col("__sample_pos"), col("__gene_pos"))
      .drop("__sample_pos", "__gene_pos").collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(4))).toSeq
    // reference emits sample-outer (cna/transformer.go:591-606)
    assert(ordered == Seq(
      ("study_a_TCGA-S1", "BRCA1", "0"), ("study_a_TCGA-S1", "TP53", "1"),
      ("study_a_TCGA-S2", "BRCA1", "-1"), ("study_a_TCGA-S2", "TP53", "0"),
      ("study_a_TCGA-S3", "BRCA1", "2"), ("study_a_TCGA-S3", "TP53", "-2")))
    val plain = CnaOps.unpivotDerived(df, "study_a", "study_a_gistic")
    assert(plain.columns.toSeq == Schemas.cnaDerived.fieldNames.toSeq)
  }

  test("O13/O14/O15/O16: MAF transform — schemas, mapping, drift fill, ids") {
    val df = TsvReader.readMaf(spark, s"$studies/study_a/data_mutations.txt")
    val (ev, mu) = MutationOps.transformMaf(df, "study_a", "study_a_mutations")
    assert(ev.columns.toSeq == Schemas.mutationEvent.fieldNames.toSeq)
    assert(mu.columns.toSeq == Schemas.mutation.fieldNames.toSeq)
    val evRows = ev.orderBy("MUTATION_EVENT_ID").collect()
    assert(evRows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    val first = evRows.head
    def f(name: String) = first.getString(ev.columns.indexOf(name))
    assert(f("TUMOR_SEQ_ALLELE") == "G")      // ← Tumor_Seq_Allele2
    assert(f("PROTEIN_CHANGE") == "p.V600E")  // ← HGVSp_Short
    assert(f("MUTATION_TYPE") == "Missense_Mutation") // ← Variant_Classification
    assert(f("REFSEQ_MRNA_ID") == "" && f("KEYWORD") == "") // always-"" cols
    // drift: this MAF has no Matched_Norm_Sample_Barcode → ""
    val muFirst = mu.orderBy("MUTATION_EVENT_ID").collect().head
    def m(name: String) = muFirst.getString(mu.columns.indexOf(name))
    assert(m("SAMPLE_ID") == "study_a_TCGA-S1")
    assert(m("MATCHED_NORM_SAMPLE_BARCODE") == "")
    assert(m("AMINO_ACID_CHANGE") == "p.V600E")
    assert(m("ANNOTATION_JSON") == "")
  }

  test("O16: id contiguity invariant across files (per-file offsets)") {
    val tmp = Files.createTempDirectory("graft_mut").toString
    // copy fixtures so pipeline outputs don't pollute src/test/resources
    for (s <- Seq("study_a", "study_b")) {
      Files.createDirectories(Paths.get(s"$tmp/$s"))
      for (n <- Seq("meta_mutations.txt", "data_mutations.txt"))
        Files.copy(Paths.get(s"$studies/$s/$n"), Paths.get(s"$tmp/$s/$n"))
    }
    val written = Pipelines.convertMutations(spark, tmp)
    assert(written.size == 4)
    val allEvents = CombineOps.combine(spark,
      written.filter(_.endsWith("_mutation_event.parquet")))
    val ids = allEvents.select("MUTATION_EVENT_ID")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 5L)) // 3 rows study_a + 2 rows study_b, contiguous
  }

  test("O18: convert-cna pipeline + combine round trip") {
    val tmp = Files.createTempDirectory("graft_cna").toString
    Files.createDirectories(Paths.get(s"$tmp/study_a"))
    for (n <- Seq("meta_cna.txt", "data_cna.txt"))
      Files.copy(Paths.get(s"$studies/study_a/$n"), Paths.get(s"$tmp/study_a/$n"))
    val written = Pipelines.convertCna(spark, tmp, withDerived = true)
    assert(written.size == 3)
    val combined = Pipelines.combine(spark, s"$tmp/study_a", "combined",
      Pipelines.cnaDerivedSuffixes)
    assert(combined.size == 3)
    val ga = spark.read.parquet(combined.head)
    assert(ga.count() == 2)
    // self-exclusion: recombining the same dir must not double-count
    val again = CombineOps.combineGlob(spark,
      s"$tmp/study_a/*_genetic_alterations.parquet", combined.head)
    assert(again.count() == 2)
  }
}
