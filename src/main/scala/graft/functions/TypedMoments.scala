package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Exact integer second moments (n, Σx, Σx²) of a long column. */
final case class Moments(n: Long, sx: Long, sxx: Long)

/** The TYPED Aggregator API surface (`org.apache.spark.sql.expressions.
  * Aggregator` + `functions.udaf`): the same moment math as the e5_stats
  * query, but as a reusable compile-time-typed aggregate — zero/reduce/
  * merge over a case-class buffer with product encoders, registrable as a
  * SQL UDAF. Moments merge associatively, so map-side partial aggregation
  * applies like any built-in. */
object MomentsAgg extends Aggregator[Long, Moments, Moments] {
  override def zero: Moments = Moments(0L, 0L, 0L)
  override def reduce(b: Moments, x: Long): Moments =
    Moments(b.n + 1, b.sx + x, b.sxx + x * x)
  override def merge(a: Moments, b: Moments): Moments =
    Moments(a.n + b.n, a.sx + b.sx, a.sxx + b.sxx)
  override def finish(r: Moments): Moments = r
  override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
}
