package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `ArrayType(FloatType)` columns, as pure
  * Catalyst expressions (`zip_with`/`aggregate` higher-order functions — no
  * UDF serialization, stays inside codegen).
  *
  * Accumulation is an explicit left-to-right fold in double precision, so a
  * given pair of vectors produces bit-identical results on any engine that
  * folds sequentially — the property the correctness oracle relies on.
  */
object VectorFunctions {

  import org.apache.spark.sql.graft.Bridge.{column => toCol, expression => toExpr}

  /** Codegen'd integer dot product (ArrayType(LongType) inputs). */
  def dotLong(a: Column, b: Column): Column =
    toCol(DotProductLong(toExpr(a), toExpr(b)))

  /** Codegen'd float dot product with double accumulation. */
  def dotFloat(a: Column, b: Column): Column =
    toCol(DotProductFloat(toExpr(a), toExpr(b)))

  /** Dot product in double precision — composable higher-order form (same
    * sequential accumulation as dotFloat, but interpreted; prefer dotFloat /
    * dotLong in hot paths). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dotFloat(a, a))

  /** Cosine similarity: dot / (||a|| * ||b||). */
  def cosine(a: Column, b: Column): Column =
    dotFloat(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane-family LSH bucket, axis-aligned variant: the sign
    * pattern of the first `bits` dimensions as a '0'/'1' string. Exact (no
    * FP accumulation), cheap, and a genuine locality-sensitive hash for
    * cosine distance: nearby vectors share sign patterns with high
    * probability. Used to restrict ANN search to one bucket. */
  def signBucket(a: Column, bits: Int): Column =
    if (bits <= 0) lit("") // 0-wide bucket: blocking degenerates to the base key
    else concat((1 to bits).map(i =>
      when(element_at(a, i) >= 0f, "1").otherwise("0")): _*)
}
