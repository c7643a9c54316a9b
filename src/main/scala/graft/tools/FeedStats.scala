package graft.tools

import java.nio.file.{Files, Paths}

import graft.sinks.TableLog

/** Feed-listing observability (the VERDICT r17 "measure before
  * building" item): `feedLinksBetween` lists the WHOLE `_feed`
  * directory per call — O(feed dir), not O(window) — which is fine at
  * 100k links but would dominate bounded CDC reads on a long-lived
  * high-commit-rate feed if directory listing cost grows past the
  * window's read cost. This probe times a 10-version bounded window
  * (the `o88_changes_between` shape) against synthetic feeds of
  * 1k / 10k / 100k links (one link per version), reporting per-call
  * listing milliseconds (min of 5 after a warm-up). Interpretation:
  * the listing is pure driver metadata — if the 100k-link call stays
  * in the low tens of milliseconds, a per-version subdir layout (or a
  * manifest-carried link index) buys nothing a real workload would
  * notice, and the flat layout keeps the crash-atomicity story
  * (link + marker in ONE directory) simple. Numbers land in DEVNOTES.
  *
  *   sbt "runMain graft.tools.FeedStats [linkCounts.csv]"
  *
  * Prints one JSON line. No SparkSession — the listing is pure
  * filesystem work.
  */
object FeedStats {
  def main(args: Array[String]): Unit = {
    val counts = args.lift(0).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1000, 10000, 100000))
    val results = counts.map { n =>
      val t = Files.createTempDirectory(s"graft_feedstats_$n").toString
      val feed = Paths.get(t, "_feed")
      Files.createDirectories(feed)
      // one link per version, the steady-stream shape; names match the
      // real publisher's `v<9-digit>_<part>` convention
      (1 to n).foreach { v =>
        Files.createFile(feed.resolve(f"v$v%09d_part-000.parquet"))
      }
      def window(): Int =
        TableLog.feedLinksBetween(t, n.toLong - 9, n.toLong).size
      require(window() == 10, "probe setup: window must hold 10 links")
      val times = (1 to 6).map { _ =>
        val t0 = System.nanoTime()
        window()
        (System.nanoTime() - t0) / 1e6
      }.drop(1) // first call warms the dentry cache like a real reader
      // a FULL unbounded read for contrast (lists + keeps everything)
      val tf0 = System.nanoTime()
      val full = TableLog.feedLinksBetween(t, 0L, n.toLong).size
      val fullMs = (System.nanoTime() - tf0) / 1e6
      require(full == n)
      (n, times.min, fullMs)
    }
    val per = results.map { case (n, w, f) =>
      s"""{"links":$n,"window10_ms":${f"$w%.3f"},""" +
        s""""full_ms":${f"$f%.3f"}}"""
    }.mkString(",")
    println(s"""{"metric":"feed_listing","runs":[$per]}""")
  }
}
