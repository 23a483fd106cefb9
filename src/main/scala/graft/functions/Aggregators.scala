package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregators — the `Aggregator[IN, BUF, OUT]` extension
  * surface (SURVEY §2.2 "UDF/UDAF/UDTF"). Buffers are tiny case classes,
  * so partial aggregation (map-side combine) applies automatically.
  */
object Aggregators {

  final case class CentsBuf(cents: Long, n: Long)

  /** Exact mean of a 2-decimal money column: accumulate integer cents
    * (lossless), divide once at finish. Deterministic under any partition
    * order — the well-behaved custom-UDAF shape. Input is boxed
    * `java.lang.Long` so SQL NULLs are SKIPPED like AVG's (a primitive
    * encoder would zero-fill them and drag the mean toward 0).
    */
  class ExactMeanCents extends Aggregator[java.lang.Long, CentsBuf, Double] {
    override def zero: CentsBuf = CentsBuf(0L, 0L)
    override def reduce(b: CentsBuf, cents: java.lang.Long): CentsBuf =
      if (cents == null) b else CentsBuf(b.cents + cents, b.n + 1)
    override def merge(a: CentsBuf, b: CentsBuf): CentsBuf =
      CentsBuf(a.cents + b.cents, a.n + b.n)
    override def finish(b: CentsBuf): Double =
      if (b.n == 0) 0.0 else b.cents.toDouble / (100.0 * b.n)
    override def bufferEncoder: Encoder[CentsBuf] = Encoders.product[CentsBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  final case class MinMaxBuf(min: Double, max: Double, n: Long)

  /** Range (max - min) aggregator. */
  class RangeAgg extends Aggregator[Double, MinMaxBuf, Double] {
    override def zero: MinMaxBuf =
      MinMaxBuf(Double.PositiveInfinity, Double.NegativeInfinity, 0L)
    override def reduce(b: MinMaxBuf, x: Double): MinMaxBuf =
      MinMaxBuf(math.min(b.min, x), math.max(b.max, x), b.n + 1)
    override def merge(a: MinMaxBuf, b: MinMaxBuf): MinMaxBuf =
      MinMaxBuf(math.min(a.min, b.min), math.max(a.max, b.max), a.n + b.n)
    override def finish(b: MinMaxBuf): Double =
      if (b.n == 0) 0.0 else b.max - b.min
    override def bufferEncoder: Encoder[MinMaxBuf] = Encoders.product[MinMaxBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
