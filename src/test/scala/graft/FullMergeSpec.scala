package graft

import graft.catalog.GraftCatalog
import graft.plans.ResolveGraftCatalogReads
import graft.sinks.TableLog
import org.apache.spark.sql.functions._

/** The FULL SQL MERGE clause matrix through Spark's own row-level
  * framework — conditional matched actions, multiple clauses per
  * branch, and `WHEN NOT MATCHED BY SOURCE` (the full-sync idiom:
  * target rows absent from the source update or delete). Nothing in
  * graft special-cases these: Spark's `RewriteMergeIntoTable`
  * produces the ReplaceData (group-based COW) or WriteDelta
  * (MOR delta) plan over [[graft.catalog.GraftRowLevel]], and these
  * pins prove the operation's scan/write halves carry every clause
  * combination, not just the canonical upsert.
  *
  * One semantic consequence pinned here: a NOT-MATCHED-BY-SOURCE
  * clause makes EVERY target row a candidate, so the runtime group
  * filter cannot prune scan groups by source keys — the whole table
  * rewrites (COW) or is scanned (MOR). That is inherent to the
  * semantics, not a graft limitation. */
class FullMergeSpec extends SparkSpec {

  import spark.implicits._

  private val CAT = "graftfm"

  private lazy val warehouse: String = {
    val wh = java.nio.file.Files.createTempDirectory("graft_fm_wh")
      .toString
    spark.conf.set(s"spark.sql.catalog.$CAT",
      classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$CAT.warehouse", wh)
    ResolveGraftCatalogReads.install(spark)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CAT.fm")
    wh
  }

  /** target k=0..9 v=k*10; source k=5..14 v=k*100. Clauses:
    *   MATCHED AND s.v > 700        → DELETE          (k=8,9)
    *   MATCHED                      → UPDATE v = s.v  (k=5,6,7)
    *   NOT MATCHED AND s.k < 13     → INSERT          (k=10,11,12)
    *   NOT MATCHED BY SOURCE AND t.k < 2 → DELETE     (k=0,1)
    *   NOT MATCHED BY SOURCE        → UPDATE v = -1   (k=2,3,4)
    * Final: 2..4 → -1; 5..7 → k*100; 10..12 → k*100. */
  private def runScenario(table: String): Unit = {
    spark.range(10).select($"id".as("k"), ($"id" * 10).as("v"))
      .createOrReplaceTempView("fm_t0")
    spark.sql(s"INSERT INTO $table SELECT k, v FROM fm_t0")
    spark.range(5, 15).select($"id".as("k"), ($"id" * 100).as("v"))
      .createOrReplaceTempView("fm_src")
    spark.sql(s"""MERGE INTO $table t USING fm_src s ON t.k = s.k
      WHEN MATCHED AND s.v > 700 THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED AND s.k < 13 THEN INSERT (k, v) VALUES (s.k, s.v)
      WHEN NOT MATCHED BY SOURCE AND t.k < 2 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = -1""")
    val want = Seq(2L -> -1L, 3L -> -1L, 4L -> -1L,
      5L -> 500L, 6L -> 600L, 7L -> 700L,
      10L -> 1000L, 11L -> 1100L, 12L -> 1200L)
    val got = spark.sql(s"SELECT k, v FROM $table ORDER BY k")
      .as[(Long, Long)].collect().toSeq
    assert(got == want, s"$table full-clause merge result")
  }

  test("full MERGE clause matrix on a COW (group-based) table") {
    val wh = warehouse
    spark.sql(s"CREATE TABLE $CAT.fm.cow (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('statsCols' = 'k')")
    runScenario(s"$CAT.fm.cow")
    val snap = TableLog.snapshot(s"$wh/fm/cow").get
    assert(snap.rows == 9 && snap.dels.isEmpty,
      "COW merge must land as plain data files, no sidecars")
    assert(snap.files.forall(_.stats.exists(_.col == "k")),
      "rewritten files must derive the declared stats")
  }

  test("full MERGE clause matrix on a MOR (delta-based) table") {
    val wh = warehouse
    spark.sql(s"CREATE TABLE $CAT.fm.mor (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('statsCols' = 'k', 'rowLevelMode' = 'mor')")
    runScenario(s"$CAT.fm.mor")
    val snap = TableLog.snapshot(s"$wh/fm/mor").get
    assert(snap.rows == 9, "manifest row accounting after delta merge")
  }

  test("a delta MERGE commits ONE deletion-vector sidecar however " +
      "many tasks wrote shards (commit-time fold)") {
    val wh = warehouse
    spark.sql(s"CREATE TABLE $CAT.fm.fold (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('statsCols' = 'k', 'rowLevelMode' = 'mor')")
    val path = s"$wh/fm/fold"
    // 8 range-clustered files; the merge touches keys in every file,
    // so the delta write lands one DV shard per task pre-fold
    TableLog.append(spark, path,
      spark.range(80000).select($"id".as("k"), ($"id" % 7).as("v"))
        .repartitionByRange(8, $"k"),
      statsCols = Seq("k"))
    spark.range(80).select(($"id" * 1000 + 1).as("k"), lit(-1L).as("v"))
      .createOrReplaceTempView("fm_fold_src")
    val before = TableLog.snapshot(path).get.dels.size
    spark.sql(s"""MERGE INTO $CAT.fm.fold t USING fm_fold_src s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v""")
    val snap = TableLog.snapshot(path).get
    assert(snap.dels.size - before == 1,
      s"per-statement sidecars must fold to 1, got " +
        s"${snap.dels.size - before} — tools.DeltaShardStats measured " +
        "one shard per TASK without the fold (write amplification via " +
        "the maintain count-gate, read amplification per statement)")
    assert(spark.sql(s"SELECT sum(v) AS s FROM $CAT.fm.fold " +
      "WHERE k % 1000 = 1 AND k < 80000").as[Long].head() == -80L)
  }

  test("two RACING delta DELETEs on disjoint keys: no lost update — " +
      "both land, or the fenced one refuses loudly and its RETRY " +
      "lands (folded sidecars stay statement-local)") {
    val wh = warehouse
    spark.sql(s"CREATE TABLE $CAT.fm.race (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('statsCols' = 'k', 'rowLevelMode' = 'mor')")
    val path = s"$wh/fm/race"
    TableLog.append(spark, path,
      spark.range(40000).select($"id".as("k"), ($"id" % 7).as("v"))
        .repartitionByRange(8, $"k"),
      statsCols = Seq("k"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // disjoint key residues; same files (every file spans both) — the
    // conservative file-identity DV fence may refuse the loser with
    // the retry contract, never silently drop or double-apply
    def del(res: Long): Future[Unit] = Future {
      def once(): Unit =
        spark.sql(s"DELETE FROM $CAT.fm.race WHERE k % 1000 = $res")
      try once() catch {
        case e: Exception
            if Option(e.getMessage).exists(_.contains("retry")) ||
              Option(e.getCause).flatMap(c =>
                Option(c.getMessage)).exists(_.contains("retry")) =>
          once() // the documented contract: retry the statement
      }
    }
    Await.result(Future.sequence(Seq(del(3L), del(7L))), 300.seconds)
    // both deletes fully applied exactly once: 40 rows per residue
    assert(spark.sql(s"SELECT count(*) AS n FROM $CAT.fm.race")
      .as[Long].head() == 40000 - 80)
    assert(spark.sql(s"SELECT count(*) AS n FROM $CAT.fm.race " +
      "WHERE k % 1000 IN (3, 7)").as[Long].head() == 0)
    assert(TableLog.snapshot(path).get.rows == 40000 - 80,
      "manifest accounting must survive the race")
    spark.sql(s"DROP TABLE $CAT.fm.race")
  }

  test("constraint DDL through the catalog: inline CHECK at CREATE, " +
      "ALTER ADD/DROP CONSTRAINT, informational kinds refused") {
    val wh = warehouse
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CAT.cd")
    // inline CHECK at CREATE TABLE (SUPPORT_TABLE_CONSTRAINT)
    spark.sql(s"CREATE TABLE $CAT.cd.t (k BIGINT, v BIGINT, " +
      "CONSTRAINT v_pos CHECK (v >= 0)) " +
      "TBLPROPERTIES ('statsCols' = 'k')")
    assert(TableLog.snapshot(s"$wh/cd/t").get.checks ==
      Seq("v_pos" -> "v >= 0"))
    val e1 = intercept[Exception](spark.sql(
      s"INSERT INTO $CAT.cd.t VALUES (1, -1)"))
    assert(e1.getMessage.contains("v_pos"))
    spark.sql(s"INSERT INTO $CAT.cd.t VALUES (1, 1), (2, 49)")
    // an unresolvable inline predicate refuses and leaves NO table
    intercept[Exception](spark.sql(
      s"CREATE TABLE $CAT.cd.bad (k BIGINT, " +
        "CONSTRAINT nope CHECK (no_such_col > 0))"))
    intercept[Exception](
      spark.sql(s"SELECT * FROM $CAT.cd.bad").collect())
    // ALTER-side refusals surface wrapped (AlterTableExec re-throws
    // connector exceptions as INTERNAL_ERROR) — match the cause chain
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(m => String.valueOf(m.getMessage))
      .mkString(" | ")
    // ALTER ADD validates existing rows: too-strict refused (Spark's
    // own validation scan errors first; our addCheckConstraint scan
    // is the backstop — accept either message, both name the
    // constraint)
    val e2 = intercept[Exception](spark.sql(
      s"ALTER TABLE $CAT.cd.t ADD CONSTRAINT v_small CHECK (v < 10)"))
    assert(chain(e2).contains("violated by existing data"), chain(e2))
    assert(TableLog.snapshot(s"$wh/cd/t").get.checks
      .forall(_._1 != "v_small"), "refused constraint must not commit")
    spark.sql(s"ALTER TABLE $CAT.cd.t ADD CONSTRAINT v_cap " +
      "CHECK (v < 50)")
    val e3 = intercept[Exception](spark.sql(
      s"INSERT INTO $CAT.cd.t VALUES (3, 50)"))
    assert(e3.getMessage.contains("v_cap"))
    // DROP CONSTRAINT releases it; IF EXISTS tolerates a missing name
    spark.sql(s"ALTER TABLE $CAT.cd.t DROP CONSTRAINT v_cap")
    spark.sql(s"INSERT INTO $CAT.cd.t VALUES (3, 50)")
    intercept[Exception](spark.sql(
      s"ALTER TABLE $CAT.cd.t DROP CONSTRAINT nope"))
    spark.sql(s"ALTER TABLE $CAT.cd.t DROP CONSTRAINT IF EXISTS nope")
    // informational kinds and NOT ENFORCED refuse loudly
    val e4 = intercept[Exception](spark.sql(
      s"ALTER TABLE $CAT.cd.t ADD CONSTRAINT pk PRIMARY KEY (k)"))
    assert(chain(e4).contains("informational"), chain(e4))
    val e5 = intercept[Exception](spark.sql(
      s"ALTER TABLE $CAT.cd.t ADD CONSTRAINT ne CHECK (v > -100) " +
        "NOT ENFORCED"))
    assert(chain(e5).contains("NOT ENFORCED"), chain(e5))
    assert(spark.sql(s"SELECT count(*) AS n FROM $CAT.cd.t")
      .as[Long].head() == 3L)
  }

  test("CHECK constraints fence the row-level write paths: COW " +
      "ReplaceData and MOR WriteDelta refuse violating new values") {
    val wh = warehouse
    for ((ns, props) <- Seq(
        ("ck", "'statsCols' = 'k'"),
        ("ckm", "'statsCols' = 'k', 'rowLevelMode' = 'mor'"))) {
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $CAT.$ns")
      spark.sql(s"CREATE TABLE $CAT.$ns.t (k BIGINT, v BIGINT) " +
        s"TBLPROPERTIES ($props)")
      val t = s"$CAT.$ns.t"
      spark.range(20).select($"id".as("k"), lit(1L).as("v"))
        .createOrReplaceTempView(s"ck_src_$ns")
      spark.sql(s"INSERT INTO $t SELECT k, v FROM ck_src_$ns")
      TableLog.addCheckConstraint(spark, s"$wh/$ns/t", "v_pos", "v >= 0")
      // a vanilla-session UPDATE writing a violating value refuses;
      // the table is untouched (Spark aborts the staged write)
      val before = TableLog.snapshot(s"$wh/$ns/t").get
      val e = intercept[Exception](
        spark.sql(s"UPDATE $t SET v = -5 WHERE k = 3"))
      assert(e.getMessage.contains("v_pos"), s"$ns: ${e.getMessage}")
      val after = TableLog.snapshot(s"$wh/$ns/t").get
      assert(after.version == before.version && after.rows == 20,
        s"$ns: refused update must not commit")
      // a violating MERGE insert refuses too; passing values land
      Seq((3L, -9L)).toDF("k", "v").createOrReplaceTempView(s"ck_m_$ns")
      intercept[Exception](spark.sql(
        s"""MERGE INTO $t t USING ck_m_$ns s ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET v = s.v"""))
      spark.sql(s"UPDATE $t SET v = 7 WHERE k = 3")
      assert(spark.sql(s"SELECT v FROM $t WHERE k = 3")
        .as[Long].head() == 7L)
      // a plain DELETE (certified survivors only) is NOT re-scanned
      // and still works under the constraint
      spark.sql(s"DELETE FROM $t WHERE k = 4")
      assert(spark.sql(s"SELECT count(*) AS n FROM $t")
        .as[Long].head() == 19L)
    }
  }

  test("runtime group filter narrows a DELETE that static stats " +
      "cannot prune") {
    val wh = warehouse
    spark.sql(s"CREATE TABLE $CAT.fm.rt (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('statsCols' = 'k')")
    val t = s"$CAT.fm.rt"
    // v carries NO manifest stats, so `WHERE v = 2` cannot prune a
    // single file statically — only the runtime group-filter subquery
    // (DISTINCT _file of matching rows) can narrow the rewrite
    spark.range(10).select($"id".as("k"), lit(1L).as("v"))
      .createOrReplaceTempView("fm_rt1")
    spark.sql(s"INSERT INTO $t SELECT k, v FROM fm_rt1")
    spark.range(1000000, 1000010).select($"id".as("k"), lit(2L).as("v"))
      .createOrReplaceTempView("fm_rt2")
    spark.sql(s"INSERT INTO $t SELECT k, v FROM fm_rt2")
    val before = TableLog.snapshot(s"$wh/fm/rt").get
    val v1Files = before.files.filter(
      _.stats.exists(st => st.col == "k" && st.max < 1000000L))
      .map(_.path).toSet
    assert(v1Files.nonEmpty && v1Files.size < before.files.size)
    spark.sql(s"DELETE FROM $t WHERE v = 2")
    val after = TableLog.snapshot(s"$wh/fm/rt").get
    assert(v1Files.subsetOf(after.files.map(_.path).toSet),
      "files holding no matching rows must carry over by reference " +
        "(runtime group filtering, not a whole-table rewrite)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $t").as[Long].head()
      == 10L)
  }

  test("NOT MATCHED BY SOURCE forces a full-table candidate set; " +
      "without it the group filter prunes to matched groups") {
    val wh = warehouse
    spark.sql(s"CREATE TABLE $CAT.fm.prune (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('statsCols' = 'k')")
    val t = s"$CAT.fm.prune"
    // two far-apart key clusters land in separate files
    spark.range(10).select($"id".as("k"), lit(0L).as("v"))
      .createOrReplaceTempView("fm_lo")
    spark.sql(s"INSERT INTO $t SELECT k, v FROM fm_lo")
    spark.range(1000000, 1000010).select($"id".as("k"), lit(0L).as("v"))
      .createOrReplaceTempView("fm_hi")
    spark.sql(s"INSERT INTO $t SELECT k, v FROM fm_hi")
    val before = TableLog.snapshot(s"$wh/fm/prune").get
    assert(before.files.size >= 2)
    val loFiles = before.files.filter(
      _.stats.exists(st => st.col == "k" && st.max < 1000000L))
    assert(loFiles.nonEmpty && loFiles.size < before.files.size)

    // canonical upsert touching only the low cluster: high-cluster
    // files must carry over BY REFERENCE (same basename in the next
    // manifest) — the runtime group filter + manifest prune at work
    Seq((3L, 7L)).toDF("k", "v").createOrReplaceTempView("fm_s1")
    spark.sql(s"""MERGE INTO $t t USING fm_s1 s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val mid = TableLog.snapshot(s"$wh/fm/prune").get
    val hiNames = before.files.filter(
      _.stats.exists(st => st.col == "k" && st.min >= 1000000L))
      .map(_.path).toSet
    assert(hiNames.nonEmpty &&
      hiNames.subsetOf(mid.files.map(_.path).toSet),
      "untouched key cluster must carry over by reference")

    // the same source with a NOT MATCHED BY SOURCE clause rewrites
    // everything: every pre-merge file is replaced
    Seq((3L, 8L)).toDF("k", "v").createOrReplaceTempView("fm_s2")
    spark.sql(s"""MERGE INTO $t t USING fm_s2 s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = v + 1""")
    val after = TableLog.snapshot(s"$wh/fm/prune").get
    assert(mid.files.map(_.path).toSet
      .intersect(after.files.map(_.path).toSet).isEmpty,
      "a NOT-MATCHED-BY-SOURCE merge has no prunable groups — " +
        "every live file is a candidate and rewrites")
    assert(spark.sql(s"SELECT sum(v) AS s FROM $t").as[Long].head()
      == 8L + 19L /* 19 other rows ticked 0→1 */,
      "by-source update must reach every unmatched row")
  }
}
