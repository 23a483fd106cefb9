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
}
