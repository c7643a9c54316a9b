package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** MATCH_RECOGNIZE-style event-sequence detection (the CEP surface SQL
  * engines expose as `MATCH_RECOGNIZE` and Flink as CEP patterns; Spark has
  * no built-in, so this is the (c)-tier custom operator from the design
  * preference order, built on `KeyValueGroupedDataset.flatMapSortedGroups`).
  *
  * Semantics: per key, events are scanned in (ts, id) order against a
  * quantified step pattern (each step = predicate + {min,max} repetitions).
  * Matching is greedy without backtracking — each step consumes as many
  * contiguous matching events as it may (up to max), then hands off to the
  * next step — and matches are non-overlapping, resuming AFTER the last
  * consumed event (MATCH_RECOGNIZE `AFTER MATCH SKIP PAST LAST ROW`).
  * For min=max=1 steps this is exactly contiguous-subsequence matching,
  * which is what the SQL-oracled registry query pins; quantified steps are
  * covered by unit tests.
  *
  * Scale shape: one shuffle on the key; the sort within each group is done
  * by Spark's sort-based aggregation machinery (flatMapSortedGroups), NOT
  * by buffering groups in memory — state per group during the scan is one
  * window of candidate events (bounded by the pattern's total max), so an
  * arbitrarily long per-key history streams through without materializing.
  */
object SequenceOps {

  final case class Step(allowed: Set[String], min: Int, max: Int) {
    require(min >= 0 && max >= min && (min > 0 || max > 0),
      s"bad quantifier {$min,$max}")
  }
  object Step {
    def one(types: String*): Step = Step(types.toSet, 1, 1)
  }

  final case class SeqEvent(key: Long, us: Long, id: Long, etype: String)
  final case class SeqMatch(key: Long, start_id: Long, end_id: Long, n: Long)

  /** Scan one key's time-ordered events, emitting non-overlapping greedy
    * matches. Streams: holds at most `sum(max)` events of lookahead. */
  private[operators] def scanKey(key: Long, it: Iterator[SeqEvent],
      steps: IndexedSeq[Step]): Iterator[SeqMatch] = {
    val totalMax = steps.map(_.max).sum
    val buf = new scala.collection.mutable.ArrayDeque[SeqEvent]()
    val out = scala.collection.mutable.ArrayBuffer[SeqMatch]()
    var source: Iterator[SeqEvent] = it

    // try to match the full pattern anchored at buf's head; returns the
    // number of events consumed, or -1. Fills buf from source as needed.
    def tryMatch(): Int = {
      var pos = 0
      var si = 0
      while (si < steps.length) {
        val st = steps(si)
        var taken = 0
        var ok = true
        while (ok && taken < st.max) {
          while (buf.size <= pos && source.hasNext) buf.append(source.next())
          if (pos < buf.size && st.allowed(buf(pos).etype)) {
            pos += 1; taken += 1
          } else ok = false
        }
        if (taken < st.min) return -1
        si += 1
      }
      pos
    }

    new Iterator[SeqMatch] {
      def hasNext: Boolean = {
        while (out.isEmpty && (buf.nonEmpty || source.hasNext)) {
          if (buf.isEmpty) buf.append(source.next())
          val consumed = tryMatch()
          if (consumed > 0) {
            out += SeqMatch(key, buf.head.id, buf(consumed - 1).id,
              consumed.toLong)
            buf.dropInPlace(consumed) // skip past last row
          } else {
            buf.removeHead() // no match anchored here; slide by one
          }
          // buffer stays bounded by the pattern's own lookahead: tryMatch
          // fills at most sum(max) events past the anchor
          assert(buf.size <= totalMax + 1)
        }
        out.nonEmpty
      }
      def next(): SeqMatch = { val m = out.head; out.remove(0); m }
    }
  }

  /** Pattern matches per key over (key, event-time, id, type) rows.
    * Returns one row per match: (key, start_id, end_id, n). */
  def matchPattern(spark: SparkSession, events: Dataset[SeqEvent],
      steps: Seq[Step]): Dataset[SeqMatch] = {
    import spark.implicits._
    val pat = steps.toIndexedSeq
    events.groupByKey(_.key)
      .flatMapSortedGroups($"us", $"id") { (k, it) => scanKey(k, it, pat) }
  }

  /** Incremental scan over a SORTED ready prefix (the streaming building
    * block). Unlike `scanKey`, running out of events is NOT automatically a
    * definitive failure: later micro-batches may deliver the completion.
    * The rule is the CEP `WITHIN` clause, enforced on BOTH axes the way
    * Flink CEP / MATCH_RECOGNIZE define it:
    *  - duration bound: a match may only consume events with
    *    `us <= anchor.us + withinUs` — an event past the window ends the
    *    anchored attempt, even if it arrived promptly (e.g. after a large
    *    watermark jump);
    *  - wait bound: an anchor at or below `cutoffUs` (= watermark −
    *    within) has waited out its completion window and resolves with the
    *    events that arrived; a younger starved anchor stops the scan and
    *    waits in state.
    * Returns emitted matches plus the leftover suffix to carry as state
    * (everything from the first still-undecided anchor). Batch semantics =
    * cutoffUs = Long.MaxValue (every starvation is definitive) with
    * withinUs = Long.MaxValue (no duration bound). */
  private[graft] def scanReady(key: Long, ready: IndexedSeq[SeqEvent],
      steps: IndexedSeq[Step], cutoffUs: Long,
      withinUs: Long = Long.MaxValue)
      : (Seq[SeqMatch], IndexedSeq[SeqEvent]) = {
    val out = scala.collection.mutable.ArrayBuffer[SeqMatch]()
    var i = 0
    var pendingAt = -1
    while (i < ready.length && pendingAt < 0) {
      // anchors past their window resolve now; younger ones may wait
      val definitive = ready(i).us <= cutoffUs
      val anchorUs = ready(i).us
      // try to match anchored at i; verdict: 0 = scanning, -1 fail,
      // -2 pending (starved and still inside its window)
      var pos = i
      var si = 0
      var verdict = 0
      while (si < steps.length && verdict == 0) {
        val st = steps(si)
        var taken = 0
        var ok = true
        while (ok && taken < st.max && verdict == 0) {
          if (pos < ready.length) {
            // subtraction (not anchorUs + withinUs) so Long.MaxValue can't
            // overflow; an out-of-window event ends the attempt (duration
            // bound) — and since ready is final up to the watermark, no
            // in-window event can still arrive behind it
            if (ready(pos).us - anchorUs > withinUs) ok = false
            else if (st.allowed(ready(pos).etype)) { pos += 1; taken += 1 }
            else ok = false
          } else if (definitive) ok = false
          else verdict = -2 // starved mid-decision: wait for more events
        }
        if (verdict == 0) {
          if (taken < st.min) verdict = -1
          else si += 1
        }
      }
      if (verdict == -2) pendingAt = i
      else if (verdict == -1) i += 1
      else {
        out += SeqMatch(key, ready(i).id, ready(pos - 1).id, (pos - i).toLong)
        i = pos
      }
    }
    val keepFrom = if (pendingAt >= 0) pendingAt else i
    (out.toSeq, ready.drop(keepFrom))
  }
}
