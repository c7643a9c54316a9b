package graft.operators

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication suite for training-data pipelines — exact, MinHash-LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale shape: every candidate-generation path is
  * (narrow per-row signature) → (shuffle on short signature keys) →
  * (within-bucket pairing). Nothing ever compares all N² rows; the only
  * shuffles key on signatures/buckets, which distribute uniformly (md5),
  * so there is no planner-visible skew at 100 TB.
  */
object DedupOps {

  /** E1: exact dedup keyed on `keyCols`, keeping the row with the smallest
    * `tieBreak` — deterministic, unlike `dropDuplicates` whose survivor
    * depends on execution order. One shuffle on the key columns; map-side
    * partial min keeps it light. */
  def exactDedupKeep(df: DataFrame, keyCols: Seq[String], tieBreak: String)
      : DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(tieBreak)).as(tieBreak))

  /** E2 stage 1 (MinHash+LSH): per-document band signatures. One output row
    * per (doc, band): the band's minhash over word-`shingleN`-gram shingles.
    * Documents with no shingles produce no rows. */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
      bands: Int, shingleN: Int = 3): DataFrame = {
    val sh = TF.shingles(col(textCol), shingleN)
    val bandSigs = array((0 until bands).map(b =>
      struct(lit(b).as("band"), TF.minhash(sh, b).as("sig"))): _*)
    df.select(col(idCol), explode(bandSigs).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
      .where(col("sig").isNotNull)
  }

  /** E2 stage 2: candidate near-dup pairs = documents sharing any band
    * signature. Self-equi-join on (band, sig) — a plain shuffle hash join on
    * a uniform key; `<` keeps each unordered pair once. */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      bands: Int, shingleN: Int = 3): DataFrame = {
    val sigs = minhashBands(df, idCol, textCol, bands, shingleN)
    val a = sigs.select(col("band"), col("sig"), col(idCol).as("id_a"))
    val b = sigs.select(col("band"), col("sig"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "sig"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** E2 variant: SimHash buckets — documents sharing a `bits`-bit simhash
    * signature. Returns (signature, member count, min member id) per bucket
    * with ≥ minSize members. */
  def simhashBuckets(df: DataFrame, idCol: String, textCol: String,
      bits: Int, minSize: Int = 2): DataFrame =
    df.select(col(idCol), TF.simhash(col(textCol), bits).as("simhash"))
      .groupBy("simhash")
      .agg(count(col(idCol)).as("n_docs"), min(col(idCol)).as("min_id"))
      .where(col("n_docs") >= minSize)

  /** E2 verify stage: exact n-gram Jaccard for candidate pairs. Candidates
    * come from `minhashCandidatePairs` (never all-pairs); the distinct
    * shingle sets are joined per pair and |A∩B| / |A∪B| computed exactly.
    * Output: pairs with `jaccard_micro` (= round(jaccard × 1e6), a long) ≥
    * thresholdMicro. Micro-units are this library's convention for emitted
    * similarity scores: the underlying ratio of exact integers is the same
    * double on every engine, and the integer output can never drift. */
  def jaccardVerifiedPairs(df: DataFrame, idCol: String, textCol: String,
      bands: Int, shingleN: Int = 3, thresholdMicro: Long = 500000): DataFrame = {
    val pairs = minhashCandidatePairs(df, idCol, textCol, bands, shingleN)
    val docShingles = df.select(col(idCol).as("id"),
      explode(array_distinct(TF.shingles(col(textCol), shingleN))).as("s"))
    val sizes = docShingles.groupBy("id").agg(count("*").as("n"))
    // |A∩B| per pair: expand pair × A-shingles, then semi-join "B also has
    // this shingle" on (id_b, s) — never materializes A×B per pair.
    val inter = pairs
      .join(docShingles.withColumnRenamed("id", "id_a"), "id_a")
      .join(docShingles.withColumnRenamed("id", "id_b"), Seq("id_b", "s"), "left_semi")
      .groupBy("id_a", "id_b").agg(count("*").as("n_common"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("jaccard_micro", round(
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double") * 1000000)
        .cast("long"))
      .where(col("jaccard_micro") >= thresholdMicro)
      .select("id_a", "id_b", "jaccard_micro")
  }

  /** Embedding-cosine near-dup: pairs within the same blocking key whose
    * cosine ≥ threshold. Blocking (e.g. a cluster label or LSH sign bucket)
    * bounds the pair blow-up; cosine is an exact sequential double fold. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, thresholdMicro: Long): DataFrame = {
    val a = df.select(col(blockCol).as("blk"), col(idCol).as("id_a"),
      col(vecCol).as("v_a"))
    val b = df.select(col(blockCol).as("blk"), col(idCol).as("id_b"),
      col(vecCol).as("v_b"))
    a.join(b, "blk")
      .where(col("id_a") < col("id_b"))
      .withColumn("cos_micro",
        round(VF.cosine(col("v_a"), col("v_b")) * 1000000).cast("long"))
      .where(col("cos_micro") >= thresholdMicro)
      .select("id_a", "id_b", "cos_micro")
  }
}
