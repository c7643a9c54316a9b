package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Write-audit-publish commit protocol for in-place table maintenance
  * (compaction, re-clustering, merge) on plain directory tables.
  *
  * The unsafe pattern this replaces: read a path, overwrite the same
  * path — a crash mid-write loses data, and a bad job publishes garbage
  * the moment the first file lands. Here every maintenance write goes:
  *
  *   0. LEASE: create `<target>__lock` (create-fails-if-exists), so a
  *      second concurrent maintenance writer fails FAST instead of
  *      interleaving stage/publish renames with the first. The lease
  *      narrows the multi-writer race to the lock filesystem's
  *      create-exclusivity; it does not close it for writers that
  *      bypass this class — the full fix is a table format with a
  *      commit log, which [[TableLog]] provides (every writer succeeds,
  *      serialized by manifest CAS). A crashed holder leaves the
  *      lock behind; `recover` clears it (along with any staging dir),
  *      which is the documented operator step after a writer death.
  *   1. WRITE to `<target>__staging` (the live table is never touched),
  *   2. AUDIT the staged result (parquet footers readable; row count
  *      equals the expected count — footer metadata, no data scan),
  *   3. PUBLISH by directory rename: `target` → `<target>__trash`,
  *      staging → `target`, drop trash. Partition-level publish swaps
  *      each `partCol=v` dir through its own per-partition trash path
  *      `<target>__trashparts/partCol=v` instead, so `recover` can tell
  *      a half-swapped partition (twin missing under target → restore)
  *      from the retired copy of an already-published one (twin present
  *      → drop).
  *
  * A crash in steps 1-2 leaves the live table byte-identical (`recover`
  * — or the next `stage` after a `recover` cleared the lease — clears
  * the stale staging dir). Step 3's rename pair is the narrow
  * non-atomic window a filesystem without a metadata pointer cannot
  * close — `recover` detects and heals it for both the whole-directory
  * and the per-partition protocol.
  *
  * At 100 TB the protocol costs a lock-file create, two metadata
  * renames, and one footer scan of the rewritten slice — nothing
  * proportional to data size.
  */
object StagedCommit {

  def stagingDirFor(target: String): String = target + "__staging"
  def trashDirFor(target: String): String = target + "__trash"
  /** Root for PER-PARTITION trash during publishPartitions — distinct
    * from the whole-dir trash so recover() can tell "half-swapped
    * partition" from "retired whole table awaiting deletion". */
  def trashPartsDirFor(target: String): String = target + "__trashparts"
  def lockFileFor(target: String): String = target + "__lock"

  /** Hive-style partition directory name (`partCol=v` with %XX escapes
    * for space, ':', '/', '%', … — exactly what Spark's writer emits),
    * so publish addresses the same dir the staged write created instead
    * of silently skipping it on special characters. */
  def partDirName(partCol: String, v: Any): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    ExternalCatalogUtils.escapePathName(partCol) + "=" +
      ExternalCatalogUtils.escapePathName(String.valueOf(v))
  }

  private def fsFor(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  final case class Staged(spark: SparkSession, target: String,
      stagedRows: Long, writerId: String)

  /** A lease younger than this is presumed to belong to a LIVE writer:
    * `recover` refuses to clear it without `force`. Ten minutes is far
    * past any single stage/publish metadata window (the protocol's own
    * cost is renames + a footer scan), so a fresh lock means a writer
    * that is still mid-write, not a crash. */
  val staleLeaseDefaultMs: Long = 10 * 60 * 1000L

  /** Step 0: take the writer lease, or fail fast if another maintenance
    * writer holds it. The claim itself is the atomic `createNewFile`;
    * the winner then records `writerId timestampMs` inside the lock so
    * `publish` can verify it still holds THIS lease (not a successor's)
    * and `recover` can tell a live writer from a dead one. */
  private def acquireLease(spark: SparkSession, target: String): String = {
    val (fs, lock) = fsFor(spark, lockFileFor(target))
    require(fs.createNewFile(lock),
      s"another maintenance writer holds the lease on $target " +
        s"(${lockFileFor(target)} exists); if its owner crashed, run " +
        "StagedCommit.recover to clear it")
    val id = java.util.UUID.randomUUID().toString
    val out = fs.create(lock, true) // we own the claim; fill in identity
    try out.write(s"$id ${System.currentTimeMillis()}"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    id
  }

  /** (writerId, timestampMs) recorded in the lock, if parseable; a
    * foreign or legacy lock (empty / unparseable) yields None and its
    * age falls back to the file modification time. */
  private def readLease(fs: FileSystem, lock: Path): Option[(String, Long)] = {
    try {
      val in = fs.open(lock)
      val bytes =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](256)
          var n = in.read(chunk)
          while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          buf.toByteArray
        } finally in.close()
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        .trim.split(" ", 2) match {
        case Array(id, ts) if ts.forall(_.isDigit) && ts.nonEmpty =>
          Some((id, ts.toLong))
        case _ => None
      }
    } catch { case _: java.io.IOException => None }
  }

  /** The swap may only run under the lease it was staged with: a lock
    * that vanished (someone recovered us away) or one holding a
    * DIFFERENT writer id (a successor re-acquired after recover) means
    * our publish would interleave with another writer's — refuse. */
  private def assertLeaseHeld(s: Staged): Unit = {
    val (fs, lock) = fsFor(s.spark, lockFileFor(s.target))
    require(fs.exists(lock),
      s"lease on ${s.target} is gone (recover() ran against this live " +
        "writer?) — refusing to publish staged data without it")
    readLease(fs, lock).foreach { case (id, _) =>
      require(id == s.writerId,
        s"lease on ${s.target} is held by writer $id, not ${s.writerId} " +
          "— a recover()+re-acquire happened mid-write; refusing to publish")
    }
  }

  private def releaseLease(spark: SparkSession, target: String): Unit = {
    val (fs, lock) = fsFor(spark, lockFileFor(target))
    fs.delete(lock, false)
  }

  /** Steps 0-2: take the lease, run `write` against the staging dir,
    * then audit it. `expectedRows < 0` skips the count equality
    * (readability is still proven — the count reads every footer).
    * Throws without touching the live table if the audit fails; a
    * THROWN write/audit releases the lease (the live table was never
    * touched, so there is nothing to recover), while a process crash
    * leaves the lease for `recover` to clear. */
  def stage(spark: SparkSession, target: String, expectedRows: Long)(
      write: String => Unit): Staged =
    stageWith(spark, target)(write) { staging =>
      // footer-only count; an expected-empty write stages no footers at all
      // (parquet emits only _SUCCESS), so there is nothing to read back
      val rows =
        if (expectedRows == 0) 0L
        else spark.read.parquet(staging).count()
      require(expectedRows < 0 || rows == expectedRows,
        s"staged write audit failed for $target: $rows rows != expected $expectedRows — not publishing")
      rows
    }

  /** `stage` with a caller-supplied audit: `audit(stagingDir)` returns
    * the staged row count, or throws to refuse the publish. For targets
    * holding MORE than one relation (a store plus its codebook), where a
    * single parquet read cannot audit the whole staging tree but the two
    * relations must still swap in ONE atomic publish — two independent
    * commits would let a crash publish a codebook inconsistent with the
    * partition layout it indexes. */
  def stageWith(spark: SparkSession, target: String)(
      write: String => Unit)(audit: String => Long): Staged = {
    val writerId = acquireLease(spark, target)
    try {
      val staging = stagingDirFor(target)
      val (fs, sp) = fsFor(spark, staging)
      if (fs.exists(sp)) fs.delete(sp, true) // a crashed predecessor's leavings
      write(staging)
      Staged(spark, target, audit(staging), writerId)
    } catch {
      case e: Throwable => releaseLease(spark, target); throw e
    }
  }

  /** Step 3: swap the audited staging dir into place and release the
    * lease. A throw mid-swap KEEPS the lease — the table needs
    * `recover` before anyone writes again. */
  def publish(s: Staged): Unit = {
    assertLeaseHeld(s)
    val (fs, target) = fsFor(s.spark, s.target)
    val staging = new Path(stagingDirFor(s.target))
    val trash = new Path(trashDirFor(s.target))
    if (fs.exists(trash)) fs.delete(trash, true)
    if (fs.exists(target))
      require(fs.rename(target, trash), s"could not retire $target")
    require(fs.rename(staging, target), s"could not publish $staging")
    fs.delete(trash, true)
    releaseLease(s.spark, s.target)
  }

  def writeAuditPublish(spark: SparkSession, target: String,
      expectedRows: Long)(write: String => Unit): Long = {
    val s = stage(spark, target, expectedRows)(write)
    publish(s)
    s.stagedRows
  }

  /** Partition-level publish for partition-pruned maintenance (merge):
    * for each touched partition value, swap `target/partCol=v` with the
    * staged one through the per-partition trash path
    * `<target>__trashparts/partCol=v`, or DELETE it when the staging
    * run emitted no rows for it (the partition was emptied); untouched
    * partitions' files are never renamed. Partition dir names use
    * Hive-style escaping (`partDirName`), matching Spark's writer.
    *
    * Before the staging dir is deleted, any partition directory it
    * still contains is an error (staged data that `touched` never
    * addressed — silent data loss otherwise), and a throw there keeps
    * the lease so `recover` runs before the next writer. */
  def publishPartitions(s: Staged, partCol: String,
      touched: Seq[Any]): Unit = {
    assertLeaseHeld(s)
    val (fs, target) = fsFor(s.spark, s.target)
    val staging = new Path(stagingDirFor(s.target))
    val trashRoot = new Path(trashPartsDirFor(s.target))
    touched.foreach { v =>
      val name = partDirName(partCol, v)
      val src = new Path(staging, name)
      val dst = new Path(target, name)
      val trash = new Path(trashRoot, name)
      if (fs.exists(src)) {
        if (fs.exists(trash)) fs.delete(trash, true)
        if (fs.exists(dst)) {
          fs.mkdirs(trashRoot)
          require(fs.rename(dst, trash), s"could not retire $dst")
        }
        require(fs.rename(src, dst), s"could not publish $src")
        fs.delete(trash, true)
      } else if (fs.exists(dst)) {
        fs.delete(dst, true) // merge emptied this partition
      }
    }
    // match the ESCAPED prefix partDirName produces — a partition column
    // whose own name needs Hive escaping would otherwise slip past this
    // guard and be silently deleted with the staging dir
    val escapedPrefix = {
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      ExternalCatalogUtils.escapePathName(partCol) + "="
    }
    val leftover =
      if (fs.exists(staging))
        fs.listStatus(staging).map(_.getPath.getName)
          .filter(_.startsWith(escapedPrefix)).toSeq
      else Nil
    require(leftover.isEmpty,
      s"staged partitions were never published (missing from `touched`): " +
        s"${leftover.mkString(", ")} — not deleting staging")
    fs.delete(staging, true)
    fs.delete(trashRoot, true)
    releaseLease(s.spark, s.target)
  }

  /** Heal a crash anywhere in the protocol:
    *   - whole-dir swap window (live dir gone, trash twin survives) →
    *     restore the trash;
    *   - per-partition swap window (`__trashparts/partCol=v` present,
    *     twin missing under target) → restore that partition; a twin
    *     that IS present means the swap completed and the trash copy is
    *     the retired one → drop it;
    *   - stale whole-dir trash next to a live target (crash after the
    *     final rename, before the trash delete) → drop it;
    *   - stale staging dir → drop it;
    *   - a dead writer's lease → clear it.
    *
    * recover() is a post-crash step, and the lock's recorded timestamp
    * (file mtime for a legacy/foreign lock) is how it distinguishes a
    * dead holder from a live one: a lease younger than `staleAfterMs`
    * means the writer may still be mid-write, and recovering would
    * discard its staging and re-admit a second writer whose renames
    * could interleave with the first's publish — so recover REFUSES
    * unless `force = true` (the operator asserting the holder is dead).
    * Returns true if anything was repaired. */
  def recover(spark: SparkSession, target: String, force: Boolean = false,
      staleAfterMs: Long = staleLeaseDefaultMs): Boolean = {
    val (fs, tp) = fsFor(spark, target)
    val trash = new Path(trashDirFor(target))
    val staging = new Path(stagingDirFor(target))
    val trashParts = new Path(trashPartsDirFor(target))
    val lock = new Path(lockFileFor(target))
    if (!force && fs.exists(lock)) {
      val bornMs = readLease(fs, lock).map(_._2)
        .getOrElse(fs.getFileStatus(lock).getModificationTime)
      val ageMs = System.currentTimeMillis() - bornMs
      require(ageMs >= staleAfterMs,
        s"lease on $target is only ${ageMs}ms old (< $staleAfterMs) — its " +
          "writer may still be alive, and recovering would discard its " +
          "staged data mid-write; pass force=true only after confirming " +
          "the holder is dead")
    }
    var repaired = false
    if (!fs.exists(tp) && fs.exists(trash)) {
      require(fs.rename(trash, tp), s"could not restore $trash")
      repaired = true
    } else if (fs.exists(trash)) {
      // target exists: the whole-dir publish completed; trash is retired
      fs.delete(trash, true); repaired = true
    }
    if (fs.exists(trashParts)) {
      fs.listStatus(trashParts).foreach { st =>
        val dst = new Path(tp, st.getPath.getName)
        if (!fs.exists(dst)) {
          fs.mkdirs(tp)
          require(fs.rename(st.getPath, dst),
            s"could not restore ${st.getPath}")
        } else {
          fs.delete(st.getPath, true) // retired copy of a completed swap
        }
      }
      fs.delete(trashParts, true)
      repaired = true
    }
    if (fs.exists(staging)) { fs.delete(staging, true); repaired = true }
    if (fs.exists(lock)) { fs.delete(lock, false); repaired = true }
    repaired
  }
}
