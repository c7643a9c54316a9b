package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.unsafe.types.UTF8String

/** TRAINED byte-pair encoding, Spark-first.
  *
  * Training splits the work by scale the way Sennrich's original BPE
  * does (arXiv:1508.07909): the CORPUS-scale stage is one distributed
  * word histogram — `split → explode → groupBy(word).count()`, a single
  * shuffle whose reduce side is the distinct-word set, bounded and
  * Zipf-compressed — and the VOCAB-scale stage (the iterative merge
  * loop) runs on the driver over that compressed word-frequency dict,
  * never over the corpus. At 100 TB the histogram is the only part
  * that touches the data; the driver part is O(distinct words), capped
  * at `maxWords` (top by count — the tail it drops is, by Zipf, a
  * vanishing share of token mass). The merge loop keeps an inverted
  * pair→words index so each iteration touches only the words that
  * contain the chosen pair, not the whole dict.
  *
  * Encoding relies on the rank-monotonicity property: merging pair
  * (x, y) can only CREATE pairs that contain the new token xy, and any
  * merge rule containing xy was necessarily learned after (x, y) — so
  * newly created pairs always have HIGHER rank, and applying the rules
  * in rank order, each globally left-to-right, is exactly the classic
  * lowest-rank-present loop. That is also what makes a fixed rule list
  * expressible as nested string replaces in the SQL oracle
  * (`e4_bpe_encode`), while the encoder here runs the indexed loop.
  *
  * Determinism (the oracle/replay contract): histogram ties break by
  * word ascending, merge-count ties by pair ascending, so the same
  * corpus always trains the same model at any parallelism. */
object Bpe {

  /** Pre-tokenizer shared by train and encode: lowercase, then runs of
    * letters-or-digits (punctuation and whitespace are dropped). The
    * SQL-oracle twin is `regexp_split_to_array(lower(s), '[^a-z0-9]+')`
    * on the ASCII corpora the oracle runs against. */
  private[functions] val wordRe = java.util.regex.Pattern
    .compile("[\\p{L}\\p{N}]+")

  private[functions] def words(text: String): Iterator[String] = {
    val m = wordRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
    new Iterator[String] {
      private var has = m.find()
      def hasNext: Boolean = has
      def next(): String = { val w = m.group(); has = m.find(); w }
    }
  }

  /** An ordered merge-rule list; rank = position. `vocab` is the id
    * space a downstream embedding table would key on: single
    * characters seen at train time (sorted) then merge products in
    * rank order. */
  final case class Model(merges: Array[(String, String)],
      chars: Array[String]) {
    def vocab: Array[String] = chars ++ merges.map(p => p._1 + p._2)
  }

  /** Fit `numMerges` rules on `textCol`. One distributed aggregation
    * over the corpus; driver work is O(maxWords · avg word len) per
    * merge in the touched-words set only. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 100000): Model = {
    import org.apache.spark.sql.functions._
    val hist = docs
      .select(explode(split(lower(col(textCol)), "[^\\p{L}\\p{N}]+"))
        .as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromHistogram(hist, numMerges)
  }

  /** The driver-side merge loop, exposed for spec fixtures. */
  private[graft] def trainFromHistogram(hist: Array[(String, Long)],
      numMerges: Int): Model = {
    import scala.collection.mutable
    val syms: Array[mutable.ArrayBuffer[String]] =
      hist.map { case (w, _) =>
        mutable.ArrayBuffer.from(w.map(_.toString))
      }
    val counts = hist.map(_._2)
    val chars = syms.iterator.flatten.toArray.distinct.sorted
    // pair -> weighted count, and pair -> word indexes containing it
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords =
      mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def addWord(i: Int, sign: Long): Unit = {
      val s = syms(i)
      var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * counts(i)
        if (c <= 0) { pairCount.remove(p); () } else pairCount(p) = c
        if (sign > 0)
          pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += i
        j += 1
      }
    }
    syms.indices.foreach(addWord(_, 1L))
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < numMerges && !done) {
      if (pairCount.isEmpty) done = true
      else {
        // deterministic argmax: count desc, then pair ascending
        val best = pairCount.iterator.reduce { (a, b) =>
          if (a._2 > b._2) a
          else if (a._2 < b._2) b
          else {
            val c = Ordering[(String, String)].compare(a._1, b._1)
            if (c <= 0) a else b
          }
        }
        if (best._2 < 2) done = true // a rule seen once generalizes nothing
        else {
          val (x, y) = best._1
          merges += best._1
          val touched = pairWords.getOrElse(best._1, mutable.HashSet.empty)
            .toArray.sorted
          touched.foreach { i =>
            addWord(i, -1L) // retract this word's pair contributions
            val s = syms(i)
            val out = mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < s.length) {
              if (j + 1 < s.length && s(j) == x && s(j + 1) == y) {
                out += x + y; j += 2
              } else { out += s(j); j += 1 }
            }
            syms(i) = out
            addWord(i, 1L)
          }
          pairWords.remove(best._1)
          pairCount.remove(best._1)
        }
      }
    }
    Model(merges.toArray, chars)
  }

  import org.apache.spark.sql.graft.Bridge

  /** Tokenize `text` with the trained rules: array of subword tokens,
    * all words concatenated in order. */
  def encode(text: Column, model: Model): Column =
    Bridge.column(BpeEncode(Bridge.expression(text),
      model.merges.toIndexedSeq))

  /** `encode` under a hand-authored rule list (the SQL-expressible
    * face the oracle replays as nested replaces). */
  def encodeWith(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(text), merges.toIndexedSeq))
}

/** BPE encode as a codegen-friendly expression: one instance call from
  * inside whole-stage codegen (the TextExpressions pattern), one tight
  * loop per row, no UDF/serialization boundary. Per-WORD results are
  * memoized in a bounded per-executor cache — Zipf makes the hit rate
  * extreme, so the merge loop runs roughly once per distinct word per
  * executor, not once per occurrence. */
case class BpeEncode(child: Expression,
    merges: IndexedSeq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType,
    containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(merges(i)._1 + "\u0000" + merges(i)._2, i); i += 1
    }
    m
  }
  // bounded word → tokens memo; cleared wholesale when full (simpler
  // and faster than LRU bookkeeping, and correctness-neutral)
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val memoCap = 65536

  private def encodeWord(w: String): Array[String] = {
    val hit = memo.get(w)
    if (hit != null) return hit
    var s: Array[String] = w.map(_.toString).toArray
    var continue = s.length > 1
    while (continue) {
      // lowest-rank adjacent pair present
      var bestRank = Int.MaxValue
      var j = 0
      while (j + 1 < s.length) {
        val r = rank.get(s(j) + "\u0000" + s(j + 1))
        if (r != null && r < bestRank) bestRank = r
        j += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val (x, y) = merges(bestRank)
        val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
        j = 0
        while (j < s.length) {
          if (j + 1 < s.length && s(j) == x && s(j + 1) == y) {
            out += x + y; j += 2
          } else { out += s(j); j += 1 }
        }
        s = out.toArray
        continue = s.length > 1
      }
    }
    if (memo.size() >= memoCap) memo.clear()
    memo.put(w, s)
    s
  }

  def compute(input: UTF8String): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    val it = Bpe.words(input.toString)
    while (it.hasNext) {
      val toks = encodeWord(it.next())
      var i = 0
      while (i < toks.length) {
        out += UTF8String.fromString(toks(i)); i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncode = copy(child = newChild)
}
