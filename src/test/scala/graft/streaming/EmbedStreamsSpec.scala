package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The embedding-drift stream must equal its oracle-gated batch entry
  * EXACTLY — same integers, any micro-batch boundary placement — the
  * TokenStreamsSpec discipline applied to the vector-space monitor.
  */
class EmbedStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("mmd drift: stream == the p169 batch entry under ragged splits") {
    import spark.implicits._
    import java.nio.file.Files
    // frozen baseline: EXACTLY p169's even-split quantized sums
    val emb = graft.Tables.t(spark, sf, "embeddings")
      .filter($"embedding".isNotNull)
    def quant = transform($"embedding",
      x => floor(x.cast("double") * lit(1e9)).cast("long"))
    val base = emb.filter($"vec_id" % 2 === 0)
      .select(posexplode(quant).as(Seq("dim", "xe9")))
      .groupBy($"dim").agg(sum($"xe9").as("b"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val dims = base.keys.max + 1
    val baselineSums = (0 until dims).map(d => base(d))
    val baselineN = emb.filter($"vec_id" % 2 === 0).count()

    // batch truth = the oracle-gated p169 entry itself
    val expected = graft.SparkEntry
      .queries("p169_mmd_drift_hourly")(spark, sf)
      .collect()
      .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(expected.size >= 3, s"fixture too sparse: ${expected.size}")

    val vecs = emb.filter($"vec_id" % 2 === 1)
      .withColumn("ts", expr(
        "timestamp_seconds(1767225600 + (vec_id * 97) % 172800)"))
      .select($"ts", $"vec_id", $"embedding")
    val dir = Files.createTempDirectory("mmdstream-vecs").toString
    val ckpt = Files.createTempDirectory("mmdstream-ckpt").toString
    val stream = spark.readStream.schema(vecs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EmbedStreams.mmdDriftStream(stream, baselineSums, baselineN,
        windowDur = "1 hour", watermark = "960 hours")
      .writeStream.format("memory").queryName("mmd_drift")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // ragged vec_id bands, never window-aligned
      Seq(0L -> 17L, 17L -> 61L, 61L -> 153L, 153L -> 100000L)
        .foreach { case (lo, hi) =>
          vecs.filter($"vec_id" >= lo && $"vec_id" < hi)
            .coalesce(1).write.mode("append").parquet(dir)
          q.processAllAvailable()
        }
      // sentinel far past the watermark so every real window emits
      val sentinelTs = 1767225600L + 2000L * 3600
      Seq((new java.sql.Timestamp(sentinelTs * 1000), 999999L,
          Array.fill(dims)(0.0f)))
        .toDF("ts", "vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("mmd_drift")
      .filter($"w_start" < new java.sql.Timestamp(
        (1767225600L + 1999L * 3600) * 1000))
      .collect()
      .map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == expected,
      s"stream mmd drift diverged from the p169 batch entry:\n" +
        s"  stream: ${got.toSeq.sortBy(_._1.getTime)}\n" +
        s"  batch:  ${expected.toSeq.sortBy(_._1.getTime)}")
    spark.catalog.clearCache()
  }

  test("mmd drift: ragged and null vectors are DROPPED, not scored") {
    import spark.implicits._
    import java.nio.file.Files
    val dims = 4
    // baseline: two vectors of ones -> sums = n * 1e9 per dim
    val baselineSums = Seq.fill(dims)(2000000000L)
    val baselineN = 2L
    val t0 = 1767225600L
    def ts(s: Long) = new java.sql.Timestamp((t0 + s) * 1000)
    val full = Array.fill(dims)(2.0f)
    val ragged = Array.fill(dims - 1)(99.0f) // out of spec: dropped
    val over = Array.fill(dims + 1)(99.0f) // out of spec: dropped
    val rows = Seq(
      (ts(60), 1L, full),
      (ts(120), 2L, ragged),
      (ts(180), 3L, over),
      (ts(240), 4L, null.asInstanceOf[Array[Float]]),
      // sentinel far past the watermark so the real window emits
      (ts(4000L * 3600), 99L, Array.fill(dims)(0.0f)))
    val dir = Files.createTempDirectory("mmdragged-vecs").toString
    val ckpt = Files.createTempDirectory("mmdragged-ckpt").toString
    val vecs = rows.toDF("ts", "vec_id", "embedding")
    val stream = spark.readStream.schema(vecs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EmbedStreams.mmdDriftStream(stream, baselineSums, baselineN,
        windowDur = "1 hour", watermark = "1 hour")
      .writeStream.format("memory").queryName("mmd_ragged")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      vecs.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("mmd_ragged")
      .filter($"w_start" === ts(0))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // only the one full-width vector scores: n_vecs = 1, and
    // mmd2_e12 = dims * (2e12 - 1e12)^2 / 1e12 = 4e12 — the ragged
    // 99s would have blown the score far past this if summed
    assert(got.toSeq == Seq((1L, dims.toLong * 1000000000000L)),
      s"ragged/null vectors leaked into the window: ${got.toSeq}")
    spark.catalog.clearCache()
  }

  test("mmd drift: an all-null dim DROPS from the score (batch null-skip)") {
    import spark.implicits._
    import java.nio.file.Files
    // the r13 ADVICE case: a window whose dim d is null in EVERY row.
    // The batch twin's row-wise SUM skips the null mean's term, so the
    // stream's pivoted reduce must contribute 0 for that dim — the
    // pre-r14 coalesce-sum-to-0 form scored (0 − m_b)² instead.
    val dims = 4
    val baselineSums = Seq.fill(dims)(2000000000L) // mb = 1e12 per dim
    val baselineN = 2L
    val t0 = 1767225600L
    def ts(s: Long) = new java.sql.Timestamp((t0 + s) * 1000)
    val rows = Seq(
      (ts(60), 1L, Seq[Option[Float]](Some(2f), Some(2f), Some(2f), None)),
      (ts(120), 2L, Seq[Option[Float]](Some(2f), Some(2f), Some(2f), None)),
      (ts(4000L * 3600), 99L, Seq[Option[Float]](Some(0f), Some(0f),
        Some(0f), Some(0f)))) // watermark sentinel
    val dir = Files.createTempDirectory("mmdnulldim-vecs").toString
    val ckpt = Files.createTempDirectory("mmdnulldim-ckpt").toString
    val vecs = rows.toDF("ts", "vec_id", "embedding")
    val stream = spark.readStream.schema(vecs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EmbedStreams.mmdDriftStream(stream, baselineSums, baselineN,
        windowDur = "1 hour", watermark = "1 hour")
      .writeStream.format("memory").queryName("mmd_nulldim")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      vecs.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("mmd_nulldim")
      .filter($"w_start" === ts(0))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // 3 live dims score (2e12 − 1e12)² = 1e24 each; the all-null dim
    // contributes NOTHING: 3e24 / 1e12 = 3e12. The coalesce-to-0 bug
    // would have added (0 − 1e12)² and read 4e12.
    assert(got.toSeq == Seq((2L, 3L * 1000000000000L)),
      s"all-null dim did not drop from the stream score: ${got.toSeq}")
    spark.catalog.clearCache()
  }
}
