package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming blocklist monitor must equal the batch per-(window,
  * term) counts when the watermark horizon covers the whole span — and
  * because the windowed count carries NO dedup state, equality must
  * hold under deliberately RAGGED micro-batch splits (unlike the
  * chunk-novelty monitor, whose within-batch dedup forces
  * window-aligned batches in its spec).
  */
class MatchStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val terms = Seq("spark", "park", "batch batch", "data line")

  test("stream == batch windowed term counts under ragged batch splits") {
    import spark.implicits._
    val docs = graft.Tables.t(spark, sf, "documents")
      .withColumn("ts", expr(
        "timestamp_seconds(1767225600 + (doc_id * 97) % 21600)"))
      .select($"ts", $"doc_id", $"text")
    val expected = docs
      .select(date_trunc("hour", $"ts").as("w"),
        explode(graft.functions.MatchFunctions.multi_match($"text", terms))
          .as("m"))
      .groupBy($"w", $"m.tid".as("tid"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(expected.size >= 8, s"fixture too sparse: ${expected.size} cells")

    val dir = Files.createTempDirectory("matchstream-docs").toString
    val ckpt = Files.createTempDirectory("matchstream-ckpt").toString
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = MatchStreams.blocklistHitsStream(stream, terms,
        windowDur = "1 hour", watermark = "96 hours")
      .writeStream.format("memory").queryName("blocklist_hits")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // ragged splits: batches cut by doc_id bands, NOT window-aligned —
      // every band mixes hours, so any hidden batch-boundary dependence
      // would show as a count mismatch
      Seq(0L -> 137L, 137L -> 211L, 211L -> 450L, 450L -> 100000L)
        .foreach { case (lo, hi) =>
          docs.filter($"doc_id" >= lo && $"doc_id" < hi)
            .coalesce(1).write.mode("append").parquet(dir)
          q.processAllAvailable()
        }
      // future sentinel advances the watermark so append flushes all
      // real windows; its own window is excluded below
      val sentinelTs = 1767225600L + 1000L * 3600
      Seq((new java.sql.Timestamp(sentinelTs * 1000), 999999L,
          "spark sentinel"))
        .toDF("ts", "doc_id", "text")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("blocklist_hits")
      .filter($"w_start" < new java.sql.Timestamp(
        (1767225600L + 999L * 3600) * 1000))
      .collect().map(r => (r.getTimestamp(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(got == expected,
      s"stream diverged from batch:\n  stream: ${got.toSeq.sortBy(_._1._1.getTime)}\n" +
        s"  batch:  ${expected.toSeq.sortBy(_._1._1.getTime)}")
    spark.catalog.clearCache()
  }
}
