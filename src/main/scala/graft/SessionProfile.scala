package graft

import org.apache.spark.sql.SparkSession

/** The engine's session profile — configs every owned session builder
  * (Bench, Verify, cli.Main, tools, tests) applies on top of its own
  * master/parallelism settings, so tuning decisions live in ONE place.
  *
  * `spark.sql.adaptive.autoBroadcastJoinThreshold = 64m`: the gate for
  * RUNTIME-MEASURED broadcast conversion. Static planning keeps the
  * conservative 10 MB default (estimates compound badly through joins),
  * but once AQE has the true materialized size of a shuffle stage, a
  * 64 MB build side is a safe broadcast on any executor profile this
  * engine targets — and it is exactly the size-gate that lets
  * mid-size derived relations (e.g. the jaccard verify stage's
  * candidate×shingle expansion) broadcast when genuinely small and
  * fall back to sort-merge in-plan when a dense corpus blows them up.
  */
object SessionProfile {
  val configs: Seq[(String, String)] = Seq(
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "64m",
    // Generated-class cache sized to the engine's query surface: the
    // default 100 entries thrashes under the ~190-query registry (and
    // any long-running application with a comparable number of
    // distinct plan shapes), so every re-run of a query pays Janino
    // compilation AND a cold HotSpot profile for code that was
    // already compiled once. Entries are compiled classes keyed by
    // source — driver-memory-bounded metadata, not data; 1000 entries
    // is a few tens of MB. (Static conf: must be set at session
    // build, which every owned builder does through this profile.)
    "spark.sql.codegen.cache.maxEntries" -> "1000",
    // Pinned UTC: EventTime's TIMESTAMP_NTZ→LTZ rewrite and every epoch
    // extraction must agree with the DuckDB oracle's naive-timestamp
    // convention regardless of host timezone.
    "spark.sql.session.timeZone" -> "UTC"
  )

  def tune(b: SparkSession.Builder): SparkSession.Builder =
    configs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
