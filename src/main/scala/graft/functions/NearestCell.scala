package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge

/** Nearest-centroid assignment as ONE codegen'd expression.
  *
  * The composable formulation (SimilarityOps.assignToCells' former
  * `array(d2_0, …, d2_{nlist-1})` + `array_min` + `array_position`
  * projection) builds nlist interpreted higher-order aggregates PER ROW —
  * fine at nlist=8, hopeless once nlist is derived from corpus size
  * (nlist ≈ n/64 for SemDeDup blocking): plan size grows with nlist and
  * every d2 pays the lambda-frame interpretation tax. This expression
  * holds the codebook as one flat reference object and runs the whole
  * argmin as a tight two-level primitive loop inside whole-stage codegen:
  * O(nlist·dim) long multiply-adds per row, no allocation.
  *
  * Semantics are bit-identical to the former formulation (and to the
  * DuckDB oracles that retrain the clustering in SQL): centroids stay
  * exact (Σvec, count) integer pairs, d2_j = Σ_i (c_j·p_i − s_{j,i})² is
  * exact long arithmetic, the single IEEE division d2_j / c_j² happens
  * once per centroid, and ties break to the FIRST minimal centroid in
  * codebook order (== lowest cell id, since callers pass the codebook
  * sorted by cell id).
  *
  * `sums` is the row-major flattened nlist×dim matrix of centroid sums;
  * `counts` and `cellIds` are per-centroid. They ride the expression as
  * reference objects (serialized once per task with the plan), not as
  * literals — an nlist=4096, dim=64 codebook is ~2 MB of plan literal
  * otherwise.
  */
case class NearestCellLong(child: Expression, sums: Array[Long],
    counts: Array[Long], cellIds: Array[Long], dim: Int)
    extends UnaryExpression {

  require(counts.length == cellIds.length &&
    sums.length == counts.length * dim,
    s"codebook shape mismatch: ${sums.length} sums, ${counts.length} counts, dim $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"input must be array<bigint>, got $other")
  }
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.LongType
  override def prettyName: String = "nearest_cell_long"

  override def nullSafeEval(input: Any): Any = {
    val p = input.asInstanceOf[ArrayData]
    val d = math.min(dim, p.numElements())
    var best = Double.PositiveInfinity
    var bestCell = 0L
    var j = 0
    while (j < counts.length) {
      val c = counts(j)
      var acc = 0L
      var i = 0
      while (i < d) {
        val diff = c * p.getLong(i) - sums(j * dim + i)
        acc += diff * diff
        i += 1
      }
      val d2 = acc.toDouble / (c * c).toDouble
      if (d2 < best) { best = d2; bestCell = cellIds(j) }
      j += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p => {
      val sumsRef = ctx.addReferenceObj("sums", sums, "long[]")
      val countsRef = ctx.addReferenceObj("counts", counts, "long[]")
      val cellsRef = ctx.addReferenceObj("cellIds", cellIds, "long[]")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val d2 = ctx.freshName("d2")
      s"""
         |int $d = java.lang.Math.min($dim, $p.numElements());
         |double $best = Double.POSITIVE_INFINITY;
         |${ev.value} = 0L;
         |for (int $j = 0; $j < ${counts.length}; $j++) {
         |  long $c = $countsRef[$j];
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $d; $i++) {
         |    long $diff = $c * $p.getLong($i) - $sumsRef[$j * $dim + $i];
         |    $acc += $diff * $diff;
         |  }
         |  double $d2 = ((double) $acc) / ((double) ($c * $c));
         |  if ($d2 < $best) { $best = $d2; ${ev.value} = $cellsRef[$j]; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestCellLong = copy(child = newChild)
}

object NearestCellLong {
  /** Column form over a quantized vector column and a (cellId, Σvec,
    * count) codebook (callers pass it sorted by cell id so first-min ==
    * lowest cell id). */
  def nearestCell(qe: Column, cents: Array[(Long, Array[Long], Long)]): Column = {
    require(cents.nonEmpty, "empty codebook")
    val dim = cents.head._2.length
    val sums = new Array[Long](cents.length * dim)
    cents.zipWithIndex.foreach { case ((_, sv, _), j) =>
      System.arraycopy(sv, 0, sums, j * dim, dim)
    }
    Bridge.column(NearestCellLong(Bridge.expression(qe), sums,
      cents.map(_._3), cents.map(_._1), dim))
  }
}
