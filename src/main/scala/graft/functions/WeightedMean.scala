package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row for [[WeightedMeanAgg]]: a weight and a value already
  * scaled to exact integers (cents), so the accumulating sums are
  * integer-exact and the only floating-point ops are the two final
  * divisions — deterministic cross-engine.
  */
case class Weighted(key: String, valueCents: Long, weight: Long)

/** Typed `Aggregator` (the Dataset-API UDAF surface; the engine's
  * catalyst-level custom aggregate is `TopKByAgg`, a
  * TypedImperativeAggregate — this is the user-facing typed twin,
  * reference §2.12): weight-weighted mean with an integer (sum,
  * weight) buffer. `reduce` runs map-side per partition and `merge`
  * combines partial buffers, so only two longs per group per
  * partition cross the shuffle — the same partial-aggregation
  * contract as any built-in agg.
  */
object WeightedMeanAgg extends Aggregator[Weighted, (Long, Long), java.lang.Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: Weighted): (Long, Long) =
    (b._1 + a.valueCents * a.weight, b._2 + a.weight)
  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)
  /** cents -> value units; emit the raw divisions (never rounded) per
    * the engine's cross-engine determinism rules. A zero-total-weight
    * group emits NULL (not NaN) — SQL division-by-zero semantics, the
    * value the DuckDB oracle produces for the same group.
    */
  override def finish(b: (Long, Long)): java.lang.Double =
    if (b._2 == 0L) null else b._1.toDouble / b._2 / 100.0
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
