package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming monitors over EMBEDDING columns — the vector-space
  * complement of [[TokenStreams]]' token-space drift monitors, built
  * on the same one-stateful-operator discipline: a CLOSED column
  * domain (here the fixed embedding width) pivots the whole score
  * into ONE watermarked windowed aggregation, so no chained stateful
  * operators and no stream-stream joins exist.
  */
object EmbedStreams {

  private val D38 = DecimalType(38, 0)

  /** Per-window linear-kernel MMD² of an embedding stream against a
    * FROZEN baseline — the streaming face of p169's hourly drift
    * monitor (and the embedding-space sibling of
    * [[TokenStreams.psiDriftStream]]): MMD² under the linear kernel is
    * ||mean_window − mean_baseline||², exact cross-multiplied integers
    * over e9-quantized elements (the dec_cosine_e6 quantization:
    * floor(double·1e9), the one IEEE op both engines and both
    * execution modes evaluate identically).
    *
    * The embedding width is the closed domain: per window, `dims`
    * conditional sums pivot map-side (one `sum(xe9[d])` column each)
    * plus the row count, and the MMD formula evaluates as a row-local
    * DECIMAL expression over those columns against the baseline sums
    * riding as LITERALS — so stream == batch EXACTLY at any
    * micro-batch boundary placement (EmbedStreamsSpec pins it against
    * the oracle-gated p169 entry). A ragged vector shorter than
    * `dims` sums only its existing components on both sides
    * (element_at past the end is NULL and sum skips it — the same
    * totals the batch side's posexplode produces); vectors LONGER
    * than `dims` are out of spec, as in lshSketches.
    *
    * Output per window: (w_start, n_vecs, mmd2_e12) with
    * mmd2_e12 = Σ_d (S_wd·n_b − B_d·n_w)² DIV ((n_w·n_b)²·10⁶) —
    * e9-quantized units make the e18-unit numerator exact; one floor
    * division renders.
    */
  def mmdDriftStream(
      emb: DataFrame, // (ts timestamp, embedding array<float>, ...)
      baselineSums: Seq[Long],
      baselineN: Long,
      windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    require(baselineN >= 1, "baselineN must be >= 1")
    require(baselineSums.nonEmpty, "baselineSums must carry the dims")
    val dims = baselineSums.length
    val quant = transform(col("embedding"),
      x => floor(x.cast("double") * lit(1e9)).cast("long"))
    val aggs = count(lit(1)).as("n") +: (0 until dims).map(d =>
      sum(element_at(col("xe9"), d + 1)).as(s"s$d"))
    val counts = emb
      .withWatermark("ts", watermark)
      .filter(col("embedding").isNotNull)
      .select(col("ts"), quant.as("xe9"))
      .groupBy(window(col("ts"), windowDur))
      .agg(aggs.head, aggs.tail: _*)
    val v = (0 until dims).map { d =>
      val t = coalesce(col(s"s$d"), lit(0L)).cast(D38) * lit(baselineN) -
        lit(baselineSums(d)).cast(D38) * col("n")
      t * t
    }.reduce(_ + _)
    counts
      .select(col("window.start").as("w_start"), col("n").as("n_vecs"),
        v.as("__v"))
      // the denominator rides DECIMAL end to end: a LONG product
      // n²·N²·10⁶ overflows past ~10⁶ rows per side
      .withColumn("__den", col("n_vecs").cast(D38) *
        col("n_vecs").cast(D38) *
        lit(BigDecimal(baselineN) * BigDecimal(baselineN) *
          BigDecimal(1000000L)).cast(D38))
      .select(col("w_start"), col("n_vecs"),
        expr("__v DIV __den").as("mmd2_e12"))
  }
}
