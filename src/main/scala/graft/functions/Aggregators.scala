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

  final case class TopKItem(ord: String, id: Long)
  final case class TopKBuf(items: Seq[TopKItem])

  /** Bounded per-key top-k: keeps the k input rows with the SMALLEST
    * `ord` string (ties broken by smaller `id`), returning their ids in
    * that order. This is the scale answer to "sample/keep k rows per
    * key": aggregation state is k rows per partition per key — map-side
    * partial aggregation applies, so a key holding 10^9 rows ships only
    * k rows per upstream partition through the shuffle, where a
    * rank-then-filter pays a full sort and a collect_list pays unbounded
    * state. Deterministic under any partition order (merge is a k-way
    * selection of an associative, commutative set union).
    */
  class TopKByOrd(k: Int)
      extends Aggregator[TopKItem, TopKBuf, Seq[Long]] {
    require(k >= 1 && k <= 1024, s"k must be in [1, 1024], got $k")
    private def trim(items: Seq[TopKItem]): Seq[TopKItem] =
      items.sortBy(i => (i.ord, i.id)).take(k)
    override def zero: TopKBuf = TopKBuf(Nil)
    override def reduce(b: TopKBuf, x: TopKItem): TopKBuf =
      // keep the buffer sorted so reduce stays O(k) per row in the
      // common case (new row past the current k-th smallest); NULL
      // sort keys are skipped like any SQL aggregate input
      if (x.ord == null) b
      else if (b.items.size >= k) {
        val last = b.items.last
        val c = x.ord.compareTo(last.ord)
        if (c > 0 || (c == 0 && x.id >= last.id)) b
        else TopKBuf(trim(b.items :+ x))
      } else TopKBuf(trim(b.items :+ x))
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf(trim(a.items ++ b.items))
    override def finish(b: TopKBuf): Seq[Long] = b.items.map(_.id)
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  final case class TopKSItem(ord: String, payload: String)
  final case class TopKSBuf(items: Seq[TopKSItem])

  /** [[TopKByOrd]] with a STRING payload instead of a long id — for
    * top-k over keys that have no natural numeric identity (tokens,
    * paths). Same contract: keeps the k input rows with the smallest
    * `ord` string (ties by smaller payload), returns payloads in that
    * order; state is k rows per partition per key, so map-side partial
    * aggregation bounds the shuffle where a rank window pays a full
    * per-key sort in one task. NULL ord rows are skipped like any SQL
    * aggregate input.
    */
  class TopKStrByOrd(k: Int)
      extends Aggregator[TopKSItem, TopKSBuf, Seq[String]] {
    require(k >= 1 && k <= 1024, s"k must be in [1, 1024], got $k")
    private def key(i: TopKSItem): (String, String) = (i.ord, i.payload)
    private def trim(items: Seq[TopKSItem]): Seq[TopKSItem] =
      items.sortBy(key).take(k)
    override def zero: TopKSBuf = TopKSBuf(Nil)
    override def reduce(b: TopKSBuf, x: TopKSItem): TopKSBuf =
      if (x.ord == null) b
      else if (b.items.size >= k) {
        val last = b.items.last
        val c = x.ord.compareTo(last.ord)
        if (c > 0 || (c == 0 && x.payload.compareTo(last.payload) >= 0)) b
        else TopKSBuf(trim(b.items :+ x))
      } else TopKSBuf(trim(b.items :+ x))
    override def merge(a: TopKSBuf, b: TopKSBuf): TopKSBuf =
      TopKSBuf(trim(a.items ++ b.items))
    override def finish(b: TopKSBuf): Seq[String] = b.items.map(_.payload)
    override def bufferEncoder: Encoder[TopKSBuf] = Encoders.product[TopKSBuf]
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }
}
