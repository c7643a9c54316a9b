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

  /** Rewrite the lock with a dead writer's identity and an hour-old
    * timestamp, so recover() sees a STALE lease (a crashed holder)
    * rather than refusing on a fresh one. */
  private def ageLock(path: String): Unit = {
    // through the Hadoop FS (not raw nio), so the checksum shadow file
    // stays consistent and recover() can actually read the lease back
    val lock = new org.apache.hadoop.fs.Path(StagedCommit.lockFileFor(path))
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(lock, true)
    try out.write(s"dead-writer ${System.currentTimeMillis() - 3600 * 1000L}"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

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
    // the dead writer's lease blocks the next attempt until recover()
    val exLease = intercept[IllegalArgumentException] {
      StagedCommit.stage(spark, path, 50) { st =>
        spark.range(50).toDF("id").write.parquet(st)
      }
    }
    assert(exLease.getMessage.contains("lease"))
    // a FRESH lease means the holder may still be alive: recover refuses
    val exFresh = intercept[IllegalArgumentException] {
      StagedCommit.recover(spark, path)
    }
    assert(exFresh.getMessage.contains("may still be alive"))
    ageLock(path) // the holder is long dead
    assert(StagedCommit.recover(spark, path), "recover clears lock+staging")
    assert(!new java.io.File(StagedCommit.lockFileFor(path)).exists())
    // the next attempt after recover succeeds
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

  test("a failed audit releases the lease (live table untouched, retry allowed)") {
    val path = tmp("graft_wap_auditlease")
    spark.range(10).toDF("id").write.parquet(path)
    intercept[IllegalArgumentException] {
      StagedCommit.writeAuditPublish(spark, path, expectedRows = 10) { st =>
        spark.range(3).toDF("id").write.parquet(st)
      }
    }
    assert(!new java.io.File(StagedCommit.lockFileFor(path)).exists(),
      "a thrown stage must not leave the lease behind")
    val rows = StagedCommit.writeAuditPublish(spark, path, 3) { st =>
      spark.range(3).toDF("id").write.parquet(st)
    }
    assert(rows == 3)
  }

  test("two concurrent compactInPlace writers: exactly one publishes") {
    import graft.operators.LayoutOps
    val path = tmp("graft_wap_race")
    spark.range(100000).select($"id", ($"id" * 3).as("v"))
      .repartition(16).write.parquet(path)
    val beforeRows = spark.read.parquet(path).count()
    val start = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Unit]]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        start.await()
        try {
          LayoutOps.compactInPlace(spark, path, targetBytes = 1L << 30)
          results.add(Right(()))
        } catch { case e: Throwable => results.add(Left(e)) }
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val (failed, ok) = results.asScala.toSeq.partition(_.isLeft)
    assert(ok.size == 1 && failed.size == 1,
      s"expected exactly one publisher, got ok=${ok.size} failed=$failed")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(failed.head.left.toOption.get).exists(_.contains("lease")),
      s"loser must fail on the lease, got ${failed.head}")
    assert(spark.read.parquet(path).count() == beforeRows)
    assert(!new java.io.File(StagedCommit.lockFileFor(path)).exists())
    assert(!new java.io.File(StagedCommit.stagingDirFor(path)).exists())
    assert(!new java.io.File(StagedCommit.trashDirFor(path)).exists())
  }

  test("recover() heals a crash inside publishPartitions' swap window") {
    val path = tmp("graft_wap_partwin")
    spark.range(100).select($"id", ($"id" % 2).cast("string").as("part"))
      .write.partitionBy("part").parquet(path)
    val before = spark.read.parquet(path).collect().map(_.toSeq).toSet
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate: writer died after retiring part=1 to its per-partition
    // trash but before publishing the staged replacement; staging and
    // lock are still on disk
    val trashParts = new org.apache.hadoop.fs.Path(
      StagedCommit.trashPartsDirFor(path))
    fs.mkdirs(trashParts)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path, "part=1"),
      new org.apache.hadoop.fs.Path(trashParts, "part=1")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      StagedCommit.stagingDirFor(path) + "/part=1"))
    fs.createNewFile(new org.apache.hadoop.fs.Path(
      StagedCommit.lockFileFor(path)))
    ageLock(path)
    assert(StagedCommit.recover(spark, path))
    // the retired partition is back, staging/trash/lock are gone
    assert(spark.read.parquet(path).collect().map(_.toSeq).toSet == before,
      "half-swapped partition must be restored")
    assert(!new java.io.File(StagedCommit.trashPartsDirFor(path)).exists())
    assert(!new java.io.File(StagedCommit.stagingDirFor(path)).exists())
    assert(!new java.io.File(StagedCommit.lockFileFor(path)).exists())
  }

  test("publishPartitions escapes Hive special characters in partition values") {
    import graft.operators.MergeOps
    val path = tmp("graft_wap_escape")
    // values with space and colon: Spark writes part=a%20b%3Ac etc.
    Seq((1L, "a b:c", 10L), (2L, "plain", 20L)).toDF("k", "part", "v")
      .write.partitionBy("part").parquet(path)
    val cdc = Seq((1L, "a b:c", 99L)).toDF("k", "part", "v")
    MergeOps.mergeWritePartitioned(spark, path, cdc, Seq("k"), "part")
    val back = spark.read.parquet(path).select("k", "part", "v").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(back.toSeq == Seq((1L, "a b:c", 99L), (2L, "plain", 20L)),
      s"escaped partition must be swapped, got ${back.toSeq}")
    assert(!new java.io.File(StagedCommit.stagingDirFor(path)).exists())
  }

  test("publishPartitions refuses to drop staged partitions missing from touched") {
    val path = tmp("graft_wap_leftover")
    spark.range(10).select($"id", ($"id" % 2).cast("string").as("part"))
      .write.partitionBy("part").parquet(path)
    val staged = StagedCommit.stage(spark, path, expectedRows = -1) { st =>
      spark.range(10).select($"id", ($"id" % 2).cast("string").as("part"))
        .write.partitionBy("part").parquet(st)
    }
    // touched names only part=0; the staged part=1 would be silently
    // discarded without the leftover guard
    val ex = intercept[IllegalArgumentException] {
      StagedCommit.publishPartitions(staged, "part", Seq("0"))
    }
    assert(ex.getMessage.contains("never published"))
    // staging kept for inspection; recover() rolls everything back
    // (force: this writer finished synchronously — known dead)
    assert(new java.io.File(StagedCommit.stagingDirFor(path)).exists())
    assert(StagedCommit.recover(spark, path, force = true))
    assert(spark.read.parquet(path).count() == 10)
  }

  test("publish refuses once its lease was recovered away or re-acquired") {
    val path = tmp("graft_wap_leaselost")
    spark.range(10).toDF("id").write.parquet(path)
    val staged = StagedCommit.stage(spark, path, expectedRows = 5) { st =>
      spark.range(5).toDF("id").write.parquet(st)
    }
    // an operator recovers this writer away mid-write (force: simulating
    // a misjudged "it crashed"); publish must refuse, not interleave
    assert(StagedCommit.recover(spark, path, force = true))
    val exGone = intercept[IllegalArgumentException] {
      StagedCommit.publish(staged)
    }
    assert(exGone.getMessage.contains("refusing to publish"))
    assert(spark.read.parquet(path).count() == 10, "live table untouched")
    // a SUCCESSOR writer re-acquires: the old handle still must not publish
    val staged2 = StagedCommit.stage(spark, path, expectedRows = 5) { st =>
      spark.range(5).toDF("id").write.parquet(st)
    }
    val exOther = intercept[IllegalArgumentException] {
      StagedCommit.publish(staged)
    }
    assert(exOther.getMessage.contains("not " + staged.writerId))
    StagedCommit.publish(staged2) // the rightful holder still can
    assert(spark.read.parquet(path).count() == 5)
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
