package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY Q55) via `Aggregator` + `udaf(...)`.
  * Both aggregators are algebraic (commutative + associative merge), so
  * Spark plans them with map-side partial aggregation — at 100 TB only the
  * per-group buffers shuffle, never rows.
  */
object Aggregators {

  /** Bitwise-OR accumulator — the reference's `tcp_flags` column is the OR
    * of all TCP flags seen over a flow's packets (`main.go:71`); this
    * re-aggregates the OR across flows per group.
    */
  object BitOrAgg extends Aggregator[Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: Long): Long = b | a
    override def merge(b1: Long, b2: Long): Long = b1 | b2
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  final case class WeightedIn(value: Long, weight: Long)
  final case class WeightedBuf(num: Long, den: Long)

  /** Weighted average over integer inputs: exact integer sums, one double
    * division at finish — deterministic under any partial-aggregation order.
    */
  object WeightedAvgAgg extends Aggregator[WeightedIn, WeightedBuf, Double] {
    override def zero: WeightedBuf = WeightedBuf(0L, 0L)
    override def reduce(b: WeightedBuf, a: WeightedIn): WeightedBuf =
      WeightedBuf(b.num + a.value * a.weight, b.den + a.weight)
    override def merge(a: WeightedBuf, b: WeightedBuf): WeightedBuf =
      WeightedBuf(a.num + b.num, a.den + b.den)
    override def finish(r: WeightedBuf): Double =
      if (r.den == 0L) Double.NaN else r.num.toDouble / r.den.toDouble
    override def bufferEncoder: Encoder[WeightedBuf] = Encoders.product[WeightedBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Elementwise minimum over fixed-length long arrays — the MinHash
    * signature combiner. One narrow agg column instead of k wide min()
    * columns: the k-wide formulation makes whole-stage codegen emit a
    * k-column aggregate whose Janino compilation dominates cold-start.
    */
  final class ElementwiseMinAgg(k: Int)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    override def reduce(b: Array[Long], a: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (a(i) < b(i)) b(i) = a(i); i += 1 }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = reduce(x, y)
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  val bit_or_agg = udaf(BitOrAgg)
  val weighted_avg = udaf(WeightedAvgAgg)
  def elementwise_min(k: Int) = udaf(new ElementwiseMinAgg(k))
}
