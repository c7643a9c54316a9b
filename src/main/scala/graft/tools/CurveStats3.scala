package graft.tools

import graft.functions.Hilbert3
import graft.functions.ZOrderLong

/** 3-D twin of [[CurveStats]]: files opened per query BOX under a
  * MORTON-3 (`zOrder3`, 48-bit) vs a HILBERT-3 ([[Hilbert3]])
  * clustering layout — the adjudication the `hilbert3` layout verb
  * hangs on (ship only if it opens ≥10% fewer files at realistic,
  * non-power-of-8 file counts; at 8^k files every file is one aligned
  * octant and the curves trivially tie).
  *
  * Method (exact, decode-only — no per-curve orientation walk): a
  * file is a contiguous index interval; decompose it ONCE into its
  * maximal 8^m-ALIGNED index blocks (≤ 2·7·16 of them), and each
  * aligned block of a space-filling curve covers exactly ONE octant —
  * a cube recovered by decoding the block's first index and
  * truncating the coords to the block's level. The file is kept for a
  * box iff any of its cubes intersects the box (cube∩box is three
  * interval overlaps). Identical machinery for both curves, so the
  * comparison is apples-to-apples by construction.
  *
  *   sbt "runMain graft.tools.CurveStats3"
  */
object CurveStats3 {

  /** Maximal aligned-block decomposition of [lo, hi] (base 8):
    * (blockStart, sideBits) with octant side = 2^sideBits cells. */
  private def alignedBlocks(lo: Long, hi: Long): Seq[(Long, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    var cur = lo
    while (cur <= hi) {
      // largest 8^m block starting at cur that fits within hi
      var m = 0
      while (m < 16 && (cur & ((1L << (3 * (m + 1))) - 1)) == 0 &&
          cur + (1L << (3 * (m + 1))) - 1 <= hi) m += 1
      out += ((cur, m))
      cur += 1L << (3 * m)
      if (cur == 0) return out.toSeq // wrapped (hi = 2^48-1 exact end)
    }
    out.toSeq
  }

  /** The octant cube (aMin, bMin, cMin, side) of one aligned block. */
  private def cubeOf(decode: Long => (Long, Long, Long),
      start: Long, m: Int): (Long, Long, Long, Long) = {
    val (a, b, c) = decode(start)
    val side = 1L << m
    val mask = ~(side - 1)
    (a & mask, b & mask, c & mask, side)
  }

  private def mortonDecode(d: Long): (Long, Long, Long) = {
    var a = 0L; var b = 0L; var c = 0L
    var i = 0
    while (i < 16) {
      a |= ((d >> (3 * i + 2)) & 1L) << i
      b |= ((d >> (3 * i + 1)) & 1L) << i
      c |= ((d >> (3 * i)) & 1L) << i
      i += 1
    }
    (a, b, c)
  }

  private def hilbertDecode(d: Long): (Long, Long, Long) = {
    val p = Hilbert3.decode16(d)
    (Hilbert3.decodeA(p), Hilbert3.decodeB(p), Hilbert3.decodeC(p))
  }

  def main(args: Array[String]): Unit = {
    // self-check: morton decode inverts the production encode, and
    // the aligned-block octant claim holds on samples
    val rnd0 = new scala.util.Random(1)
    (0 until 1000).foreach { _ =>
      val (a, b, c) = (rnd0.nextInt(65536).toLong,
        rnd0.nextInt(65536).toLong, rnd0.nextInt(65536).toLong)
      val (x, y, z) = mortonDecode(ZOrderLong.interleave3(a, b, c))
      require(x == a && y == b && z == c, "morton decode self-check")
    }
    val total = 1L << 48
    val rnd = new scala.util.Random(42)
    val fileCounts = Seq(300, 1500, 6000) // NOT powers of eight
    val shapes = Seq( // (label, wa, wb, wc)
      ("cube_512", 512L, 512L, 512L),
      ("cube_2048", 2048L, 2048L, 2048L),
      ("cube_8192", 8192L, 8192L, 8192L),
      ("slab_8192x8192x256", 8192L, 8192L, 256L),
      ("rod_16384x512x512", 16384L, 512L, 512L))
    val q = 300
    val out = new StringBuilder("{")
    var first = true
    fileCounts.foreach { f =>
      val per = total / f
      // per-file cube lists, computed once per curve
      def cubes(decode: Long => (Long, Long, Long))
          : Array[Array[(Long, Long, Long, Long)]] =
        (0 until f).map { k =>
          val lo = k * per
          val hi = if (k == f - 1) total - 1 else lo + per - 1
          alignedBlocks(lo, hi)
            .map { case (s, m) => cubeOf(decode, s, m) }.toArray
        }.toArray
      val zCubes = cubes(mortonDecode)
      val hCubes = cubes(hilbertDecode)
      shapes.foreach { case (label, wa, wb, wc) =>
        var zKept = 0L; var hKept = 0L
        (0 until q).foreach { _ =>
          val a0 = (rnd.nextDouble() * (65536 - wa)).toLong
          val b0 = (rnd.nextDouble() * (65536 - wb)).toLong
          val c0 = (rnd.nextDouble() * (65536 - wc)).toLong
          val (a1, b1, c1) = (a0 + wa - 1, b0 + wb - 1, c0 + wc - 1)
          def hit(cs: Array[(Long, Long, Long, Long)]): Boolean = {
            var i = 0
            while (i < cs.length) {
              val (ca, cb, cc, s) = cs(i)
              if (ca <= a1 && a0 <= ca + s - 1 &&
                  cb <= b1 && b0 <= cb + s - 1 &&
                  cc <= c1 && c0 <= cc + s - 1) return true
              i += 1
            }
            false
          }
          var k = 0
          while (k < f) {
            if (hit(zCubes(k))) zKept += 1
            if (hit(hCubes(k))) hKept += 1
            k += 1
          }
        }
        if (!first) out.append(",")
        first = false
        out.append(
          s""""f${f}_$label":{"z_mean":${zKept.toDouble / q},""" +
          s""""h_mean":${hKept.toDouble / q},""" +
          s""""h_over_z":${"%.4f".format(
            hKept.toDouble / math.max(1L, zKept))}}""")
      }
    }
    out.append("}")
    println(out.toString)
  }
}
