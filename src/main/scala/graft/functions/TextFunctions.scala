package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, shingling, MinHash/SimHash signatures, fingerprinting,
  * language-ID and quality heuristics — all as `Column` expressions built
  * from `org.apache.spark.sql.functions` (codegen'd, no UDFs, no shuffle;
  * every function here is embarrassingly parallel over rows, which is what
  * makes them safe at 100 TB).
  *
  * Portability note: signatures hash with `md5` (identical lowercase-hex
  * output in every engine) rather than Spark's Murmur3 `hash`, so results
  * are reproducible outside Spark — which also makes them oracle-checkable.
  */
object TextFunctions {

  /** Whitespace tokenization of lowercased text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Word n-gram shingles from an already-materialized token array column.
    *
    * Performance contract: pass an *attribute* (a column projected in a
    * previous select), not the `tokens(...)` expression itself. The lambda
    * below references the array once per n-gram element; if the reference is
    * an expression tree rather than an attribute, interpreted higher-order
    * evaluation re-computes the tokenization per element access — O(tokens²)
    * per row. (Catalyst's CollapseProject deliberately keeps a projection
    * boundary when a non-cheap alias is referenced more than once, so the
    * staged form stays staged.)
    *
    * Empty array when the document has fewer than n tokens (guard required:
    * Spark's `sequence(0, negative)` counts *down*, it does not return
    * empty). */
  def shinglesFromTokens(t: Column, n: Int): Column = {
    val cnt = size(t)
    when(cnt >= n,
      transform(sequence(lit(0), cnt - n), i =>
        concat_ws(" ", (1 to n).map(j => element_at(t, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Word n-gram shingles of raw text — convenience form for small inputs;
    * hot paths should stage `tokens` first (see shinglesFromTokens). */
  def shingles(text: Column, n: Int): Column = shinglesFromTokens(tokens(text), n)

  /** MinHash value for one hash family `seed`: min over shingles of
    * md5(seed|shingle), compared lexicographically (uniform on hex strings).
    * Null when the document has no shingles. */
  def minhash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, s => md5(concat(lit(s"$seed|"), s))))

  /** SimHash over `bits` bit positions (max 32 — md5 hex prefix). Bit p of a
    * token = high bit of the p-th md5 nibble; document bit p = sign of the
    * sum of (2*bit-1) over all tokens. Returns a '0'/'1' string of length
    * `bits` (integer arithmetic throughout — exactly reproducible).
    *
    * Each token is hashed exactly once: the md5s are materialized as an
    * array first, then folded into a per-bit sum vector in one pass. */
  def simhashFromTokens(t: Column, bits: Int): Column = {
    val hexHigh = Seq("8", "9", "a", "b", "c", "d", "e", "f").map(lit)
    val hashes = transform(t, tok => md5(tok))
    val sums = aggregate(hashes, array_repeat(lit(0), bits),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(1), lit(bits)), p =>
          when(h.substr(p, lit(1)).isin(hexHigh: _*), 1).otherwise(-1)),
        (a, b) => a + b))
    array_join(transform(sums, x => when(x >= 0, "1").otherwise("0")), "")
  }

  def simhash(text: Column, bits: Int): Column =
    simhashFromTokens(tokens(text), bits)

  /** Order-insensitive document fingerprint: md5 of the sorted distinct
    * token bag. Two documents with the same vocabulary collide — the cheap
    * first-pass near-dup key. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: ceil(len/4) per word, summed — the
    * standard "~4 chars per token" heuristic, in exact integer math. */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0),
      (acc, w) => acc + ((length(w) + lit(3)) / lit(4)).cast("int"))

  /** Tiny per-language marker vocabularies for the language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("de", "shi", "he", "zai", "le"))

  private def markerHits(t: Column, markers: Seq[String]): Column =
    aggregate(t, lit(0),
      (acc, tok) => acc + when(tok.isin(markers.map(lit): _*), 1).otherwise(0))

  /** N-gram/stopword language-ID heuristic: score = marker-token hits per
    * language; predict the argmax, ties broken alphabetically, no hits →
    * "und" (undetermined). Integer scoring — deterministic. All five
    * languages are scored in ONE codegen'd pass over the tokens
    * (TokenSetCounts); the argmax is `array_position(counts, max)`, whose
    * first-match rule IS the alphabetical tie-break (langMarkers is sorted)
    * — and whose expression tree stays O(langs), unlike a when-chain fold
    * that duplicates the accumulator struct per level. */
  def langIdFromTokens(t: Column): Column = {
    val counts = TextExpressions.tokenSetCounts(t, langMarkers.map(_._2))
    val names = array(langMarkers.map(m => lit(m._1)): _*)
    val best = array_max(counts)
    when(best > 0,
      element_at(names, array_position(counts, best).cast("int")))
      .otherwise(lit("und"))
  }

  /** The composable (interpreted higher-order) formulation — parity
    * reference for TokenSetCounts, not a hot path. */
  def langIdFromTokensComposable(t: Column): Column = {
    val scored = langMarkers.map { case (l, m) => (l, markerHits(t, m)) }
    argmaxLang(scored)
  }

  private def argmaxLang(scored: Seq[(String, Column)]): Column = {
    // fold from the end so earlier (alphabetically smaller) langs win ties
    val best = scored.reverse.tail.foldLeft(
      struct(scored.last._2.as("s"), lit(scored.last._1).as("l"))) {
      case (acc, (l, s)) =>
        when(s >= acc.getField("s"), struct(s.as("s"), lit(l).as("l"))).otherwise(acc)
    }
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  val stopwords: Seq[String] = Seq(
    "the", "a", "of", "and", "is", "in", "to", "it", "on", "for")

  /** Quality score in [0,1]: blends length saturation, stopword presence and
    * vocabulary diversity. All ratios are int/int divisions of identical
    * integers in any engine, so the double result is bit-reproducible. */
  def qualityScoreFromTokens(t: Column): Column = {
    val n = size(t).cast("double")
    val stopRatio = element_at(
      TextExpressions.tokenSetCounts(t, Seq(stopwords)), 1).cast("double") / n
    val distinctRatio = size(array_distinct(t)).cast("double") / n
    val lengthSat = least(n / lit(100.0), lit(1.0))
    round(lit(0.4) * lengthSat + lit(0.3) * stopRatio + lit(0.3) * distinctRatio, 6)
  }

  def qualityScore(text: Column): Column =
    qualityScoreFromTokens(tokens(text))

  /** BPE-ish estimate from a materialized token array. */
  def bpeTokenEstimateFromTokens(t: Column): Column =
    aggregate(t, lit(0),
      (acc, w) => acc + ((length(w) + lit(3)) / lit(4)).cast("int"))

  /** Fingerprint from a materialized token array. */
  def fingerprintFromTokens(t: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(t))))
}
