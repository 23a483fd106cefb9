package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming chunk-novelty monitor must equal the batch global
  * first-seen computation (p110's novelty side) when the watermark
  * horizon covers the whole span — the stream==batch discipline every
  * entry in graft.streaming carries.
  */
class ChunkStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("stream == batch global first-seen under a full-span horizon") {
    import spark.implicits._
    // 6-hour synthetic ingest span so the test runs 7 micro-batches,
    // one per window — batches must align to windows because WITHIN a
    // micro-batch dropDuplicatesWithinWatermark keeps an arbitrary
    // first among equal hashes (same-window attribution is order-free,
    // cross-window would not be)
    val docs = graft.Tables.t(spark, sf, "documents")
      .filter($"text".isNotNull && length($"text") > 0)
      .withColumn("ts", expr(
        "timestamp_seconds(1767225600 + (doc_id * 97) % 21600)"))
      .select($"ts", $"doc_id", $"source", $"text")
    val ch = docs.select($"ts", $"doc_id",
        explode(graft.functions.CdcFunctions.gear_chunks($"text", 6))
          .as("chunk"))
      .select($"ts", $"doc_id", md5($"chunk").as("h"))
    val expected = ch.groupBy($"h")
      .agg(min(struct($"ts", $"doc_id")).as("f"))
      .groupBy(date_trunc("hour", $"f.ts").as("w"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(expected.size >= 4, s"fixture spans too few hours: $expected")

    val dir = Files.createTempDirectory("chunkstream-docs").toString
    val ckpt = Files.createTempDirectory("chunkstream-ckpt").toString
    val schema = docs.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    // horizon far past the 6-hour span: the monitor's bounded-state
    // contract (re-count past the horizon) must not engage, so the
    // stream computes the GLOBAL first-seen the batch analog computes
    val q = ChunkStreams.newChunkTypesStream(stream, 6,
        windowDur = "1 hour", watermark = "96 hours")
      .writeStream.format("memory").queryName("chunk_novelty")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      val hours = docs.select(date_trunc("hour", $"ts").as("w"))
        .distinct().orderBy($"w").collect().map(_.getTimestamp(0))
      hours.foreach { w =>
        docs.filter(date_trunc("hour", $"ts") === w)
          .coalesce(1).write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
      // sentinel far in the future: advances the watermark past every
      // real window so append mode flushes them; its own window is
      // excluded from the comparison
      val sentinelTs = 1767225600L + 1000L * 3600
      Seq((new java.sql.Timestamp(sentinelTs * 1000), 999999L, "zz",
          "zz-sentinel-flush-zz"))
        .toDF("ts", "doc_id", "source", "text")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("chunk_novelty")
      .filter($"w_start" < new java.sql.Timestamp(
        (1767225600L + 999L * 3600) * 1000))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"stream novelty diverged from batch first-seen:\n" +
        s"  stream: ${got.toSeq.sortBy(_._1.getTime)}\n" +
        s"  batch:  ${expected.toSeq.sortBy(_._1.getTime)}")
    spark.catalog.clearCache()
  }

  test("novelty is conserved: window counts sum to the distinct type count") {
    import spark.implicits._
    // invariant of ANY correct first-seen attribution, independent of
    // arrival order: every distinct hash is new exactly once
    val docs = graft.Tables.t(spark, sf, "documents")
      .filter($"text".isNotNull && length($"text") > 0)
      .withColumn("ts", expr(
        "timestamp_seconds(1767225600 + (doc_id * 97) % 21600)"))
    val ch = docs.select($"ts", $"doc_id",
        explode(graft.functions.CdcFunctions.gear_chunks($"text", 6))
          .as("chunk"))
      .select($"ts", $"doc_id", md5($"chunk").as("h"))
    val types = ch.select($"h").distinct().count()
    val summed = ch.groupBy($"h")
      .agg(min(struct($"ts", $"doc_id")).as("f"))
      .groupBy(date_trunc("hour", $"f.ts").as("w"))
      .agg(count(lit(1)).as("n"))
      .agg(sum($"n")).collect().head.getLong(0)
    assert(summed == types, s"$summed first-seens vs $types distinct types")
    spark.catalog.clearCache()
  }
}
