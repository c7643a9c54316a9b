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
  *   1. WRITE to `<target>__staging` (the live table is never touched),
  *   2. AUDIT the staged result (parquet footers readable; row count
  *      equals the expected count — footer metadata, no data scan),
  *   3. PUBLISH by directory rename: `target` → `<target>__trash`,
  *      staging → `target`, drop trash.
  *
  * A crash in steps 1-2 leaves the live table byte-identical (the next
  * attempt clears the stale staging dir). Step 3's rename pair is the
  * narrow non-atomic window a filesystem without a metadata pointer
  * cannot close — `recover` detects and heals it (trash present +
  * target missing → restore). Single-writer batch semantics, same as
  * the reference importer's whole-study rewrites; true multi-writer
  * isolation needs a table format with a commit log, out of scope.
  *
  * At 100 TB the protocol costs two metadata renames and one footer
  * scan of the rewritten slice — nothing proportional to data size.
  */
object StagedCommit {

  def stagingDirFor(target: String): String = target + "__staging"
  def trashDirFor(target: String): String = target + "__trash"

  private def fsFor(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  final case class Staged(spark: SparkSession, target: String,
      stagedRows: Long)

  /** Steps 1-2: run `write` against the staging dir, then audit it.
    * `expectedRows < 0` skips the count equality (readability is still
    * proven — the count reads every footer). Throws without touching
    * the live table if the audit fails. */
  def stage(spark: SparkSession, target: String, expectedRows: Long)(
      write: String => Unit): Staged = {
    val staging = stagingDirFor(target)
    val (fs, sp) = fsFor(spark, staging)
    if (fs.exists(sp)) fs.delete(sp, true) // a crashed predecessor's leavings
    write(staging)
    // footer-only count; an expected-empty write stages no footers at all
    // (parquet emits only _SUCCESS), so there is nothing to read back
    val rows =
      if (expectedRows == 0) 0L
      else spark.read.parquet(staging).count()
    require(expectedRows < 0 || rows == expectedRows,
      s"staged write audit failed for $target: $rows rows != expected $expectedRows — not publishing")
    Staged(spark, target, rows)
  }

  /** Step 3: swap the audited staging dir into place. */
  def publish(s: Staged): Unit = {
    val (fs, target) = fsFor(s.spark, s.target)
    val staging = new Path(stagingDirFor(s.target))
    val trash = new Path(trashDirFor(s.target))
    if (fs.exists(trash)) fs.delete(trash, true)
    if (fs.exists(target))
      require(fs.rename(target, trash), s"could not retire $target")
    require(fs.rename(staging, target), s"could not publish $staging")
    fs.delete(trash, true)
  }

  def writeAuditPublish(spark: SparkSession, target: String,
      expectedRows: Long)(write: String => Unit): Long = {
    val s = stage(spark, target, expectedRows)(write)
    publish(s)
    s.stagedRows
  }

  /** Partition-level publish for partition-pruned maintenance (merge):
    * for each touched partition value, swap `target/partCol=v` with the
    * staged one, or DELETE it when the staging run emitted no rows for
    * it (the partition was emptied); untouched partitions' files are
    * never renamed. Partition values must render stably via toString
    * (longs/strings — the engine's partition-key types). */
  def publishPartitions(s: Staged, partCol: String,
      touched: Seq[Any]): Unit = {
    val (fs, target) = fsFor(s.spark, s.target)
    val staging = new Path(stagingDirFor(s.target))
    touched.foreach { v =>
      val name = s"$partCol=$v"
      val src = new Path(staging, name)
      val dst = new Path(target, name)
      val trash = new Path(trashDirFor(s.target))
      if (fs.exists(trash)) fs.delete(trash, true)
      if (fs.exists(src)) {
        if (fs.exists(dst))
          require(fs.rename(dst, trash), s"could not retire $dst")
        require(fs.rename(src, dst), s"could not publish $src")
        fs.delete(trash, true)
      } else if (fs.exists(dst)) {
        fs.delete(dst, true) // merge emptied this partition
      }
    }
    fs.delete(staging, true)
  }

  /** Heal a crash inside publish's swap window: the live dir is gone
    * but its trash twin survives → restore it. Also drops any stale
    * staging dir. Returns true if anything was repaired. */
  def recover(spark: SparkSession, target: String): Boolean = {
    val (fs, tp) = fsFor(spark, target)
    val trash = new Path(trashDirFor(target))
    val staging = new Path(stagingDirFor(target))
    var repaired = false
    if (!fs.exists(tp) && fs.exists(trash)) {
      require(fs.rename(trash, tp), s"could not restore $trash")
      repaired = true
    }
    if (fs.exists(staging)) { fs.delete(staging, true); repaired = true }
    repaired
  }
}
