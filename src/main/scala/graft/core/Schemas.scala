package graft.core

import org.apache.spark.sql.types._

/** Output table schemas of the engine — the cBioPortal `cgds.sql`-mirroring
  * tables the reference produces (reference: cna/transformer.go:438-459,
  * mutation/transformer.go:254-309), plus the MAF source-column mapping used
  * by the mutation projections (mutation/transformer.go:351-406).
  *
  * Design note (SURVEY.md §1.4): the reference types *everything* utf8 except
  * the int64 MUTATION_EVENT_ID. We keep those observable schemas at the sink
  * boundary, but operators may carry typed intermediates (ArrayType for the
  * sample-value vector) and collapse to the string encodings late.
  */
object Schemas {

  private def s(names: String*): Seq[StructField] =
    names.map(n => StructField(n, StringType, nullable = true))

  /** genetic_alteration — cna/transformer.go:438-443. */
  val geneticAlteration: StructType = StructType(
    s("CANCER_STUDY", "GENETIC_PROFILE", "GENE_SYMBOL", "VALUES"))

  /** genetic_profile_samples — cna/transformer.go:446-450. */
  val geneticProfileSamples: StructType = StructType(
    s("CANCER_STUDY", "GENETIC_PROFILE", "ORDERED_SAMPLE_LIST"))

  /** derived (CNA long/melted) — cna/transformer.go:453-459. */
  val cnaDerived: StructType = StructType(
    s("SAMPLE_ID", "CANCER_STUDY", "GENE_SYMBOL", "GENETIC_PROFILE", "ALTERATION"))

  /** mutation_event — mutation/transformer.go:254-276.
    * (MAF source column, or "" when the event field has no MAF source.) */
  val mutationEventColumns: Seq[(String, String)] = Seq(
    "ENTREZ_GENE_ID"       -> "Entrez_Gene_Id",
    "CHR"                  -> "Chromosome",
    "START_POSITION"       -> "Start_Position",
    "END_POSITION"         -> "End_Position",
    "REFERENCE_ALLELE"     -> "Reference_Allele",
    "TUMOR_SEQ_ALLELE"     -> "Tumor_Seq_Allele2",
    "PROTEIN_CHANGE"       -> "HGVSp_Short",
    "MUTATION_TYPE"        -> "Variant_Classification",
    "NCBI_BUILD"           -> "NCBI_Build",
    "STRAND"               -> "Strand",
    "VARIANT_TYPE"         -> "Variant_Type",
    "DB_SNP_RS"            -> "dbSNP_RS",
    "DB_SNP_VAL_STATUS"    -> "dbSNP_Val_Status",
    // No MAF source — always "" (mutation/transformer.go:364-371):
    "REFSEQ_MRNA_ID"       -> "",
    "CODON_CHANGE"         -> "",
    "UNIPROT_ACCESSION"    -> "",
    "PROTEIN_POS_START"    -> "",
    "PROTEIN_POS_END"      -> "",
    "CANONICAL_TRANSCRIPT" -> "",
    "KEYWORD"              -> ""
  )

  val mutationEvent: StructType = StructType(
    StructField("MUTATION_EVENT_ID", LongType, nullable = false) +:
      s(mutationEventColumns.map(_._1): _*))

  /** mutation — mutation/transformer.go:279-309 (mapping :373-407).
    * GENETIC_PROFILE_ID and SAMPLE_ID are computed, not direct MAF lookups. */
  val mutationColumns: Seq[(String, String)] = Seq(
    "ENTREZ_GENE_ID"                -> "Entrez_Gene_Id",
    "CENTER"                        -> "Center",
    "SEQUENCER"                     -> "Sequencer",
    "MUTATION_STATUS"               -> "Mutation_Status",
    "VALIDATION_STATUS"             -> "Validation_Status",
    "TUMOR_SEQ_ALLELE1"             -> "Tumor_Seq_Allele1",
    "TUMOR_SEQ_ALLELE2"             -> "Tumor_Seq_Allele2",
    "MATCHED_NORM_SAMPLE_BARCODE"   -> "Matched_Norm_Sample_Barcode",
    "MATCH_NORM_SEQ_ALLELE1"        -> "Match_Norm_Seq_Allele1",
    "MATCH_NORM_SEQ_ALLELE2"        -> "Match_Norm_Seq_Allele2",
    "TUMOR_VALIDATION_ALLELE1"      -> "Tumor_Validation_Allele1",
    "TUMOR_VALIDATION_ALLELE2"      -> "Tumor_Validation_Allele2",
    "MATCH_NORM_VALIDATION_ALLELE1" -> "Match_Norm_Validation_Allele1",
    "MATCH_NORM_VALIDATION_ALLELE2" -> "Match_Norm_Validation_Allele2",
    "VERIFICATION_STATUS"           -> "Verification_Status",
    "SEQUENCING_PHASE"              -> "Sequencing_Phase",
    "SEQUENCE_SOURCE"               -> "Sequence_Source",
    "VALIDATION_METHOD"             -> "Validation_Method",
    "SCORE"                         -> "Score",
    "BAM_FILE"                      -> "BAM_File",
    "TUMOR_ALT_COUNT"               -> "t_alt_count",
    "TUMOR_REF_COUNT"               -> "t_ref_count",
    "NORMAL_ALT_COUNT"              -> "n_alt_count",
    "NORMAL_REF_COUNT"              -> "n_ref_count",
    "AMINO_ACID_CHANGE"             -> "HGVSp_Short"
  )

  val mutation: StructType = StructType(
    StructField("MUTATION_EVENT_ID", LongType, nullable = false) +:
      (s("GENETIC_PROFILE_ID", "SAMPLE_ID") ++
        s(mutationColumns.map(_._1): _*) ++
        s("ANNOTATION_JSON")))

  /** All-string schema from a header line (reference infers every input
    * column as utf8 — cna/reader.go:22-26, mutation/reader.go:35-39). */
  def allStringSchema(header: Seq[String]): StructType =
    StructType(header.map(h => StructField(h, StringType, nullable = true)))
}
