package graft

import graft.sinks.StagedCommit
import org.apache.spark.sql.functions._

/** Crash-safety contract of the write-audit-publish protocol: the live
  * table stays byte-identical through every failure before publish, a
  * failed audit never publishes, and the swap-window crash heals. */
class StagedCommitSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  /** (relative path, length, first bytes) of every file under dir —
    * byte-level identity fingerprint. */
  private def fingerprint(dir: String): Set[(String, Long, Seq[Byte])] = {
    val root = java.nio.file.Paths.get(dir)
    val out = scala.collection.mutable.Set[(String, Long, Seq[Byte])]()
    java.nio.file.Files.walk(root).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) {
        val bytes = java.nio.file.Files.readAllBytes(p)
        out += ((root.relativize(p).toString, bytes.length.toLong,
          bytes.take(64).toSeq))
      }
    }
    out.toSet
  }

  test("a crash between write and publish leaves the live table byte-identical") {
    val path = tmp("graft_wap_crash")
    spark.range(100).select($"id", ($"id" % 5).as("m")).write.parquet(path)
    val before = fingerprint(path)
    // stage only — the "crash" is never calling publish
    StagedCommit.stage(spark, path, expectedRows = 50) { st =>
      spark.range(50).select($"id", ($"id" % 5).as("m")).write.parquet(st)
    }
    assert(fingerprint(path) == before, "live table must be untouched")
    assert(spark.read.parquet(path).count() == 100)
    // the next attempt clears the stale staging dir and succeeds
    val rows = StagedCommit.writeAuditPublish(spark, path, 50) { st =>
      spark.range(50).select($"id", ($"id" % 5).as("m")).write.parquet(st)
    }
    assert(rows == 50 && spark.read.parquet(path).count() == 50)
    assert(!new java.io.File(StagedCommit.stagingDirFor(path)).exists())
  }

  test("a failed audit never publishes") {
    val path = tmp("graft_wap_audit")
    spark.range(100).toDF("id").write.parquet(path)
    val before = fingerprint(path)
    val ex = intercept[IllegalArgumentException] {
      StagedCommit.writeAuditPublish(spark, path, expectedRows = 100) { st =>
        spark.range(42).toDF("id").write.parquet(st) // lost rows
      }
    }
    assert(ex.getMessage.contains("audit failed"))
    assert(fingerprint(path) == before)
  }

  test("recover() heals a crash inside the swap window") {
    val path = tmp("graft_wap_recover")
    spark.range(100).toDF("id").write.parquet(path)
    val before = fingerprint(path)
    // simulate publish dying after retiring the live dir: target gone,
    // trash holds the data
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(StagedCommit.trashDirFor(path))))
    assert(!new java.io.File(path).exists())
    assert(StagedCommit.recover(spark, path))
    assert(fingerprint(path) == before)
    assert(!StagedCommit.recover(spark, path), "second recover is a no-op")
  }

  test("zOrderInPlace re-clusters under the same audit; content intact") {
    import graft.operators.LayoutOps
    val path = tmp("graft_wap_zorder")
    spark.range(20000)
      .select((col("id") % 200).as("a"), (col("id") / 200).as("b"))
      .repartition(8).write.parquet(path)
    val before = spark.read.parquet(path).collect().map(_.toSeq)
      .groupBy(identity).view.mapValues(_.size).toMap
    LayoutOps.zOrderInPlace(spark, path, nFiles = 8,
      "a", (0L, 199L), "b", (0L, 99L))
    val after = spark.read.parquet(path).collect().map(_.toSeq)
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(after == before, "multiset of rows must survive the rewrite")
    // clustered: per-file span on `a` shrinks well under the full range
    assert(LayoutOps.meanFileSpanFraction(spark, path, "a") < 0.6)
    assert(!new java.io.File(StagedCommit.stagingDirFor(path)).exists())
    assert(!new java.io.File(StagedCommit.trashDirFor(path)).exists())
  }

  test("compactInPlace survives its own audit and keeps content") {
    import graft.operators.LayoutOps
    val path = tmp("graft_wap_compact")
    spark.range(1000).select($"id", ($"id" * 3).as("v"))
      .repartition(16).write.parquet(path)
    val beforeRows = spark.read.parquet(path).collect().map(_.toSeq).toSet
    val (b, a) = LayoutOps.compactInPlace(spark, path, targetBytes = 1L << 30)
    assert(b == 16 && a < 4, s"$b -> $a")
    assert(spark.read.parquet(path).collect().map(_.toSeq).toSet == beforeRows)
    assert(!new java.io.File(StagedCommit.stagingDirFor(path)).exists())
    assert(!new java.io.File(StagedCommit.trashDirFor(path)).exists())
  }
}
