package graft.tools

import graft.functions.{HilbertLong, ZOrderLong}

/** Measurement: files opened per query box under a MORTON (z-order)
  * vs a HILBERT clustering layout — the adjudication the hilbert
  * alternative hangs on (it is only worth shipping as a layout verb if
  * it opens measurably fewer files at realistic file counts).
  *
  * Model: the 65536² cell space range-partitioned into F files of
  * equal CURVE-INTERVAL length (exactly what `zOrder`'s
  * repartitionByRange produces on uniform keys); a query box keeps a
  * file iff its interval contains at least one cell of the box, which
  * the interval-box walks answer EXACTLY (budget raised so no keep-on-
  * exhaustion noise). Boxes: squares and 16:1 skewed rectangles of
  * several sizes, uniformly placed, 300 each, fixed seed. Reported:
  * mean files kept per shape for both curves, the h/z ratio, and the
  * walk's planning-time cost per (file × box) test.
  *
  *   sbt "runMain graft.tools.CurveStats"
  */
object CurveStats {
  def main(args: Array[String]): Unit = {
    val n = 65536L
    val total = n * n
    val budget = 1 << 22
    val rnd = new scala.util.Random(42)
    // NOT powers of four: at 4^k files every file is one aligned
    // quadrant and the two curves trivially tie — real tables straddle
    // quadrant boundaries, which is exactly where the curves differ
    val fileCounts = Seq(300, 1500, 6000)
    // (label, width-a, width-b)
    val shapes = Seq(
      ("sq_256", 256L, 256L), ("sq_1024", 1024L, 1024L),
      ("sq_4096", 4096L, 4096L),
      ("skew_4096x256", 4096L, 256L), ("skew_16384x1024", 16384L, 1024L))
    val q = 300
    val out = new StringBuilder("{")
    var firstEntry = true
    fileCounts.foreach { f =>
      val per = total / f
      shapes.foreach { case (label, wa, wb) =>
        var zKept = 0L; var hKept = 0L
        var zNanos = 0L; var hNanos = 0L
        (0 until q).foreach { _ =>
          val a0 = (rnd.nextDouble() * (n - wa)).toLong
          val b0 = (rnd.nextDouble() * (n - wb)).toLong
          val (a1, b1) = (a0 + wa - 1, b0 + wb - 1)
          var k = 0
          while (k < f) {
            val lo = k * per; val hi = lo + per - 1
            var t = System.nanoTime()
            if (ZOrderLong.zBoxIntersects(lo, hi, a0, a1, b0, b1,
              nodeBudget = budget)) zKept += 1
            zNanos += System.nanoTime() - t
            t = System.nanoTime()
            if (HilbertLong.hBoxIntersects(lo, hi, a0, a1, b0, b1,
              nodeBudget = budget)) hKept += 1
            hNanos += System.nanoTime() - t
            k += 1
          }
        }
        val tests = q.toLong * f
        if (!firstEntry) out.append(",")
        firstEntry = false
        out.append(
          s""""f${f}_$label":{"z_mean":${zKept.toDouble / q},""" +
          s""""h_mean":${hKept.toDouble / q},""" +
          s""""h_over_z":${"%.4f".format(
            hKept.toDouble / math.max(1L, zKept))},""" +
          s""""z_us_per_test":${"%.3f".format(zNanos / 1000.0 / tests)},""" +
          s""""h_us_per_test":${"%.3f".format(hNanos / 1000.0 / tests)}}""")
      }
    }
    out.append("}")
    println(out.toString)
  }
}
