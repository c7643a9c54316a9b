package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** Codegen-friendly replacements for the interpreted higher-order-function
  * text signatures in TextFunctions. Higher-order functions
  * (`transform`/`aggregate`) are CodegenFallback: per-element lambda frames,
  * boxed accumulators, and a materialized intermediate array per token.
  * These expressions run one tight JVM loop per row instead, invoked from
  * inside whole-stage codegen via a single instance call — semantics are
  * bit-identical to the composable forms (parity-tested in ExtOpsSpec).
  */
object TextExpressions {
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private[functions] def md5Digest(s: UTF8String): Array[Byte] = {
    val md = md5Local.get()
    md.reset()
    md.digest(s.getBytes)
  }

  /** md5(prefix ++ body) without materializing the concatenation. */
  private[functions] def md5DigestPrefixed(prefix: Array[Byte],
      body: Array[Byte]): Array[Byte] = {
    val md = md5Local.get()
    md.reset()
    md.update(prefix)
    md.digest(body)
  }

  import org.apache.spark.sql.graft.Bridge

  /** Codegen'd SimHash (see TextFunctions.simhashFromTokens). */
  def simhashBits(tokens: Column, bits: Int): Column =
    Bridge.column(SimHashBits(Bridge.expression(tokens), bits))

  /** Membership counts of a token array against each of `sets`. */
  def tokenSetCounts(tokens: Column, sets: Seq[Seq[String]]): Column =
    Bridge.column(TokenSetCounts(Bridge.expression(tokens), sets))

  /** Two 60-bit longs from a string's md5 (see Md5Halves). */
  def md5Halves(s: Column): Column =
    Bridge.column(Md5Halves(Bridge.expression(s)))

  /** Winnowed rolling-hash fingerprints (see WinnowFingerprints). */
  def winnowFingerprints(s: Column, k: Int, window: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(s), k, window))

  /** Unicode NFC normalization (see NormalizeNfc). */
  def normalizeNfc(s: Column): Column =
    Bridge.column(NormalizeNfc(Bridge.expression(s)))

  /** PII scrubbing — the redaction pass a training-data pipeline runs
    * before anything else sees the text: emails, IPv4 addresses, and
    * phone-shaped digit runs replace with typed placeholders. Pure
    * composition of Spark's codegen'd `regexp_replace` (no UDF, no
    * custom expression); patterns restricted to the RE2-compatible
    * subset (no lookarounds) so an external replay — the DuckDB
    * oracle, or a Go/Rust scrubber on the same corpus — matches
    * byte-for-byte. Order matters: emails first (their local parts
    * contain digits a phone pattern could bite), then IPs (dotted
    * digit runs a phone pattern could bite), then phones. */
  // the one definition both faces (Column + SQL `scrub_pii`) build from
  private[functions] val piiEmailRe =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[functions] val piiIpRe =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[functions] val piiPhoneRe = "\\+?\\d[\\d() -]{7,}\\d"

  def scrubPii(c: Column): Column = {
    import org.apache.spark.sql.functions.regexp_replace
    val email = regexp_replace(c, piiEmailRe, "<EMAIL>")
    val ip = regexp_replace(email, piiIpRe, "<IP>")
    regexp_replace(ip, piiPhoneRe, "<PHONE>")
  }

  /** Expression twin of [[scrubPii]] for the SQL function registry. */
  private[graft] def scrubPiiExpr(e: org.apache.spark.sql.catalyst
      .expressions.Expression): org.apache.spark.sql.catalyst
      .expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace}
    def rr(c: org.apache.spark.sql.catalyst.expressions.Expression,
        p: String, r: String) = RegExpReplace(c, Literal(p), Literal(r))
    rr(rr(rr(e, piiEmailRe, "<EMAIL>"), piiIpRe, "<IP>"),
      piiPhoneRe, "<PHONE>")
  }
}

/** Unicode NFC normalization — the canonicalization pass every text
  * pipeline runs before tokenizing/hashing (decomposed e + U+0301 and
  * precomposed é must dedup, fingerprint, and shingle identically).
  * `Normalizer.isNormalized` fast-paths the overwhelmingly-ASCII/NFC
  * common case to a scan with NO string rebuild, so the hot path stays
  * allocation-free; only genuinely denormalized rows pay the rebuild.
  * Codegen'd like the other expressions: one instance call from inside
  * whole-stage codegen. Oracle twin: DuckDB's nfc_normalize. */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_nfc"

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfc", this, classOf[NormalizeNfc].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

/** Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03 — the MOSS sketch): Rabin-Karp rolling hashes of every
  * `k`-byte gram (base 257, mod 1e9+7 — products fit long), then the MIN
  * hash of each `window` consecutive grams, deduplicated and sorted. Two
  * documents sharing any sufficiently long substring share fingerprints,
  * and the sketch is position-independent — the standard near-dup /
  * provenance fingerprint a training-data pipeline needs.
  *
  * O(n) per document via the rolling update (the SQL-oracle formulation
  * recomputes each gram — same values, quadratic; this expression is the
  * scale path). Documents shorter than k + window - 1 bytes yield an empty
  * array. ASCII-byte semantics (byte == ord(char)). */
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
    extends UnaryExpression {
  require(k >= 1 && window >= 1)

  private val B = 257L
  private val M = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val nh = n - k + 1
    if (nh < window) return new GenericArrayData(Array.emptyLongArray)
    // B^(k-1) mod M for the rolling leading-byte removal
    var bk1 = 1L
    var i = 0
    while (i < k - 1) { bk1 = bk1 * B % M; i += 1 }
    val hs = new Array[Long](nh)
    var h = 0L
    i = 0
    while (i < n) {
      if (i >= k) h = (h - (bytes(i - k) & 0xffL) * bk1 % M + M) % M
      h = (h * B + (bytes(i) & 0xffL)) % M
      if (i >= k - 1) hs(i - k + 1) = h
      i += 1
    }
    // min per window of `window` consecutive hashes, distinct, sorted
    val mins = new java.util.TreeSet[java.lang.Long]()
    var w = 0
    while (w + window <= nh) {
      var m = hs(w)
      var j = 1
      while (j < window) { if (hs(w + j) < m) m = hs(w + j); j += 1 }
      mins.add(m)
      w += 1
    }
    val out = new Array[Long](mins.size)
    val it = mins.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** struct(h1, h2): the two 60-bit halves of md5(input) that the MinHash
  * pipeline combines as h1 + band·h2. Bit-identical to
  *   conv(substring(hex, 1, 15), 16, 10)  /  conv(substring(hex, 17, 15), 16, 10)
  * (hex chars 1-15 = high nibbles of digest bytes 0-7 shifted; chars 17-31
  * = bytes 8-15 likewise) — but straight from the digest bytes: no hex
  * rendering, no substring allocs, no base-16 string parse per shingle. */
case class Md5Halves(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false)))
  override def prettyName: String = "md5_halves"

  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val d = TextExpressions.md5Digest(s)
    def be64(off: Int): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (d(off + i) & 0xffL); i += 1 }
      v
    }
    val h1 = be64(0) >>> 4 // first 15 hex chars (nibbles 0-14)
    val h2 = be64(8) >>> 4 // hex chars 17-31 (nibbles 16-30)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](h1, h2))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5h", this, classOf[Md5Halves].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Halves =
    copy(child = newChild)
}

/** SimHash over `bits` bit positions of each token's md5 (nibble p high bit
  * → +1 else -1; per-bit sums; sign → '0'/'1' string). Exactly
  * TextFunctions.simhashFromTokens — including its treatment of null
  * elements (a null token contributes -1 to every bit) — with one md5
  * digest per token and no intermediate hex strings. */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 32, "bits must be in [1, 32] (md5 nibbles)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be array<string>, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_bits"

  def compute(arr: ArrayData): UTF8String = {
    val sums = new Array[Int](bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var p = 0
        while (p < bits) { sums(p) -= 1; p += 1 }
      } else {
        val digest = TextExpressions.md5Digest(arr.getUTF8String(i))
        var p = 0
        while (p < bits) {
          val b = digest(p >> 1) & 0xff
          val nib = if ((p & 1) == 0) b >>> 4 else b & 0xf
          if (nib >= 8) sums(p) += 1 else sums(p) -= 1
          p += 1
        }
      }
      i += 1
    }
    val chars = new Array[Char](bits)
    var p = 0
    while (p < bits) {
      chars(p) = if (sums(p) >= 0) '1' else '0'
      p += 1
    }
    UTF8String.fromString(new String(chars))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHashBits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

/** For a token array, the number of elements contained in each of `sets`
  * (null tokens count in none) — `array<int>` aligned with `sets`. One pass
  * with hash-set membership, replacing one interpreted `aggregate(...isin…)`
  * scan of the token array PER set (language-ID runs five). */
case class TokenSetCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "token_set_counts"

  @transient private lazy val compiled: Array[java.util.HashSet[UTF8String]] =
    sets.map { s =>
      val hs = new java.util.HashSet[UTF8String](s.size * 2)
      s.foreach(w => hs.add(UTF8String.fromString(w)))
      hs
    }.toArray

  def compute(arr: ArrayData): ArrayData = {
    val counts = new Array[Int](compiled.length)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        var j = 0
        while (j < compiled.length) {
          if (compiled(j).contains(tok)) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("setCounts", this, classOf[TokenSetCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCounts =
    copy(child = newChild)
}
