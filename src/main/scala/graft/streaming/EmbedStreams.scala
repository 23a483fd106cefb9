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
    * ||mean_window − mean_baseline||², integer arithmetic over
    * e9-quantized elements (the dec_cosine_e6 quantization:
    * floor(double·1e9), the one IEEE op both engines and both
    * execution modes evaluate identically) with per-dim means
    * quantized to e12 units before the square — the p168/p169
    * n-INDEPENDENT overflow shape: the old cross-multiplied form
    * (S_wd·n_b − B_d·n_w)² scales as (n_w·n_b·Δ)² and overflows
    * DECIMAL(38,0) at ~10⁶ rows per side under real drift, while
    * every squared mean-difference here is bounded by the element
    * magnitude alone, at any window size.
    *
    * The embedding width is the closed domain: per window, `dims`
    * sums pivot map-side (one `sum(xe9[d])` column each) plus the
    * row count, each per-dim mean evaluates as a row-local sign-safe
    * trunc division (negate-divide-negate — matching the BigInteger
    * trunc the baseline means use below), and the score compares
    * against the baseline means riding as LITERALS — so stream ==
    * batch EXACTLY at any micro-batch boundary placement
    * (EmbedStreamsSpec pins it against the oracle-gated p169 entry).
    *
    * CONTRACT: full-width vectors only. A vector whose length is not
    * exactly `dims` is out of spec and DROPPED in-plan (the
    * lshSketches stance) — a ragged vector cannot be scored against a
    * fixed-width baseline mean without inventing a fill value, and
    * silently summing its prefix would diverge from the batch twin's
    * per-(window,dim) counts.
    *
    * Output per window: (w_start, n_vecs, mmd2_e12) with
    * mmd2_e12 = Σ_d (m_wd − m_bd)² DIV 10¹²,
    * m_e12 = trunc(S_e9·10³ / n).
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
    // baseline per-dim e12 means: BigInteger divide truncates toward
    // zero — the same value the in-plan negate-divide-negate yields
    val baseMeans: IndexedSeq[Long] = (0 until dims).map { d =>
      java.math.BigInteger.valueOf(baselineSums(d))
        .multiply(java.math.BigInteger.valueOf(1000L))
        .divide(java.math.BigInteger.valueOf(baselineN))
        .longValueExact()
    }
    val quant = transform(col("embedding"),
      x => floor(x.cast("double") * lit(1e9)).cast("long"))
    // decimal-sum before aggregate (the KMeansOp.fit / p168 discipline):
    // a LongType sum wraps silently at n·A ~ 9.2e18 elements-units per
    // (window, dim) while the batch twin's decimal sum stays exact — the
    // cast inside the aggregate keeps stream == batch to n·A ≤ 1e26
    val aggs = count(lit(1)).as("n") +: (0 until dims).map(d =>
      sum(element_at(col("xe9"), d + 1).cast(D38)).as(s"s$d"))
    val counts = emb
      .withWatermark("ts", watermark)
      .filter(col("embedding").isNotNull &&
        size(col("embedding")) === lit(dims))
      .select(col("ts"), quant.as("xe9"))
      .groupBy(window(col("ts"), windowDur))
      .agg(aggs.head, aggs.tail: _*)
    // a dim whose every element in the window is null sums to NULL; the
    // batch twin (p169) lets that null mean's squared term DROP from its
    // row-wise SUM (aggregate null-skip), so the pivoted reduce here must
    // coalesce the TERM to zero — coalescing the SUM to zero (the pre-r14
    // form) scored (0 − m_b)² instead and broke the pinned stream ==
    // batch contract exactly on all-null dims
    val withMeans = counts.select(
      col("window").as("window") +: col("n").as("n_vecs") +:
        (0 until dims).map { d =>
          expr(s"CASE WHEN s$d >= 0 THEN (s$d * 1000) DIV n " +
            s"ELSE -(((-s$d) * 1000) DIV n) END").as(s"m$d")
        }: _*)
    val v = (0 until dims).map { d =>
      val t = col(s"m$d").cast(D38) - lit(baseMeans(d)).cast(D38)
      coalesce(t * t, lit(0).cast(D38))
    }.reduce(_ + _)
    withMeans
      .select(col("window.start").as("w_start"), col("n_vecs"),
        v.as("__v"))
      .select(col("w_start"), col("n_vecs"),
        expr("__v DIV 1000000000000").as("mmd2_e12"))
  }
}
