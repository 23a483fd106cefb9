package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming fertility monitor must equal the batch per-window
  * (n_tokens, n_pieces, n_unk_tokens) sums when the watermark horizon
  * covers the whole span — and because the windowed sums carry NO
  * dedup state, equality must hold under deliberately RAGGED
  * micro-batch splits (the MatchStreamsSpec discipline; contrast the
  * chunk-novelty monitor whose dedup state needs aligned batches in
  * its spec).
  */
class TokenStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val vocab = graft.queries.Pipeline7.UgVocab

  test("stream == batch windowed fertility under ragged batch splits") {
    import spark.implicits._
    val docs = graft.Tables.t(spark, sf, "documents")
      .withColumn("ts", expr(
        "timestamp_seconds(1767225600 + (doc_id * 97) % 21600)"))
      .select($"ts", $"doc_id", $"text")
    val expected = docs
      .select(date_trunc("hour", $"ts").as("w"),
        explode(split($"text", " ")).as("word"))
      .select($"w",
        graft.functions.UnigramFunctions.unigram_pieces($"word", vocab)
          .as("pieces"))
      .groupBy($"w")
      .agg(count(lit(1)).as("n_tokens"),
        sum(size($"pieces")).as("n_pieces"),
        sum(when($"pieces" === array(lit("[UNK]")), 1L).otherwise(0L))
          .as("n_unk"))
      .collect()
      .map(r => r.getTimestamp(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(expected.size >= 4, s"fixture too sparse: ${expected.size}")
    assert(expected.values.exists(_._3 > 0),
      "fixture must exercise the UNK path in-stream (v-words)")

    val dir = Files.createTempDirectory("tokenstream-docs").toString
    val ckpt = Files.createTempDirectory("tokenstream-ckpt").toString
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = TokenStreams.fertilityStream(stream, vocab,
        windowDur = "1 hour", watermark = "96 hours")
      .writeStream.format("memory").queryName("token_fertility")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // ragged splits: doc_id bands, never window-aligned
      Seq(0L -> 101L, 101L -> 260L, 260L -> 333L, 333L -> 100000L)
        .foreach { case (lo, hi) =>
          docs.filter($"doc_id" >= lo && $"doc_id" < hi)
            .coalesce(1).write.mode("append").parquet(dir)
          q.processAllAvailable()
        }
      val sentinelTs = 1767225600L + 1000L * 3600
      Seq((new java.sql.Timestamp(sentinelTs * 1000), 999999L, "spark"))
        .toDF("ts", "doc_id", "text")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("token_fertility")
      .filter($"w_start" < new java.sql.Timestamp(
        (1767225600L + 999L * 3600) * 1000))
      .collect()
      .map(r => r.getTimestamp(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected,
      s"stream diverged from batch:\n  stream: ${got.toSeq.sortBy(_._1.getTime)}\n" +
        s"  batch:  ${expected.toSeq.sortBy(_._1.getTime)}")
    // the derived ratio is consistent with the sums it rides on
    spark.table("token_fertility").collect().foreach { r =>
      assert(r.getAs[Long]("fertility_centi") ==
        r.getAs[Long]("n_pieces") * 100 / r.getAs[Long]("n_tokens"))
    }
    spark.catalog.clearCache()
  }

  test("vocab novelty: stream == batch first-seen under a full-span horizon") {
    import spark.implicits._
    // window-aligned micro-batches, the ChunkStreamsSpec discipline:
    // WITHIN a batch dropDuplicatesWithinWatermark keeps an arbitrary
    // first among equal keys — same-window attribution is order-free,
    // cross-window would not be
    val docs = graft.Tables.t(spark, sf, "documents")
      .filter($"text".isNotNull && length($"text") > 0)
      .withColumn("ts", expr(
        "timestamp_seconds(1767225600 + (doc_id * 97) % 21600)"))
      .select($"ts", $"doc_id", $"text")
    val tri = docs
      .select($"ts", $"doc_id", split($"text", " ").as("ws"))
      .select($"ts", $"doc_id", explode(expr("""CASE WHEN size(ws) >= 3
        THEN transform(sequence(1, size(ws) - 2),
          i -> concat(element_at(ws, i), ' ',
                      element_at(ws, i + 1), ' ',
                      element_at(ws, i + 2)))
        ELSE array() END""")).as("tok"))
    val expected = tri.groupBy($"tok")
      .agg(min(struct($"ts", $"doc_id")).as("f"))
      .groupBy(date_trunc("hour", $"f.ts").as("w"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(expected.size >= 4, s"fixture spans too few hours: $expected")
    // every window must still be finding new trigrams (the p133 growth
    // fact, restated stream-side), or the novelty monitor tests nothing
    assert(expected.values.forall(_ > 0), s"degenerate growth: $expected")

    val dir = Files.createTempDirectory("vocabstream-docs").toString
    val ckpt = Files.createTempDirectory("vocabstream-ckpt").toString
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = TokenStreams.vocabNoveltyStream(stream,
        windowDur = "1 hour", watermark = "96 hours")
      .writeStream.format("memory").queryName("vocab_novelty")
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
      val sentinelTs = 1767225600L + 1000L * 3600
      Seq((new java.sql.Timestamp(sentinelTs * 1000), 999999L,
          "zz zz zz zz-sentinel"))
        .toDF("ts", "doc_id", "text")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("vocab_novelty")
      .filter($"w_start" < new java.sql.Timestamp(
        (1767225600L + 999L * 3600) * 1000))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"stream vocab novelty diverged from batch first-seen:\n" +
        s"  stream: ${got.toSeq.sortBy(_._1.getTime)}\n" +
        s"  batch:  ${expected.toSeq.sortBy(_._1.getTime)}")
    spark.catalog.clearCache()
  }

  test("xent drift: stream == the p154 batch entry under ragged splits") {
    import spark.implicits._
    // the frozen model: EXACTLY p154's even-split KN stats
    val all = graft.Tables.t(spark, sf, "documents")
      .filter($"text".isNotNull && $"text" =!= "")
    def bigrams(df: org.apache.spark.sql.DataFrame) = df
      .select(split($"text", " ").as("ws"))
      .select(explode(expr("""CASE WHEN size(ws) >= 2
        THEN transform(sequence(1, size(ws) - 1),
          i -> struct(element_at(ws, i) AS prev,
                      element_at(ws, i + 1) AS cur))
        ELSE array() END""")).as("bg"))
      .select($"bg.prev", $"bg.cur")
    val bc = bigrams(all.filter($"doc_id" % 2 === 0))
      .groupBy($"prev", $"cur").agg(count(lit(1)).as("cvw"))
      .localCheckpoint(true)
    val cc = bc.groupBy($"prev")
      .agg(sum($"cvw").as("cv"), count(lit(1)).as("n1v"))
      .localCheckpoint(true)
    val nw = bc.groupBy($"cur").agg(count(lit(1)).as("nw"))
      .localCheckpoint(true)
    val bp = bc.count() +
      all.filter($"doc_id" % 2 === 0)
        .select(explode(split($"text", " ")).as("t"))
        .agg(countDistinct($"t")).collect()(0).getLong(0)
    // batch truth = the oracle-gated p154 entry itself
    val expected = graft.SparkEntry
      .queries("p154_perplexity_drift")(spark, sf)
      .collect()
      .map(r => r.getTimestamp(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(expected.size >= 4, s"fixture too sparse: ${expected.size}")

    val docs = all.filter($"doc_id" % 2 === 1)
      .withColumn("ts", expr(
        "timestamp_seconds(1767225600 + (doc_id * 97) % 172800)"))
      .select($"ts", $"doc_id", $"text")
    val dir = Files.createTempDirectory("xentstream-docs").toString
    val ckpt = Files.createTempDirectory("xentstream-ckpt").toString
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = TokenStreams.xentDriftStream(stream, bc, cc, nw, bp,
        windowDur = "1 hour", watermark = "960 hours")
      .writeStream.format("memory").queryName("xent_drift")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // ragged doc_id bands, never window-aligned
      Seq(0L -> 77L, 77L -> 230L, 230L -> 411L, 411L -> 100000L)
        .foreach { case (lo, hi) =>
          docs.filter($"doc_id" >= lo && $"doc_id" < hi)
            .coalesce(1).write.mode("append").parquet(dir)
          q.processAllAvailable()
        }
      val sentinelTs = 1767225600L + 2000L * 3600
      Seq((new java.sql.Timestamp(sentinelTs * 1000), 999999L, "the end"))
        .toDF("ts", "doc_id", "text")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("xent_drift")
      .filter($"w_start" < new java.sql.Timestamp(
        (1767225600L + 1999L * 3600) * 1000))
      .collect()
      .map(r => r.getTimestamp(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected,
      s"stream xent drift diverged from the p154 batch entry:\n" +
        s"  stream: ${got.toSeq.sortBy(_._1.getTime)}\n" +
        s"  batch:  ${expected.toSeq.sortBy(_._1.getTime)}")
    spark.catalog.clearCache()
  }

  test("psi drift: stream == the p163 batch entry under ragged splits") {
    import spark.implicits._
    import java.nio.file.Files
    // frozen baseline: EXACTLY p163's even-split bucket shares
    val all = graft.Tables.t(spark, sf, "documents")
      .select($"doc_id", $"n_chars",
        expr("least(9L, n_chars DIV 100)").as("bucket"))
    val base = all.filter($"doc_id" % 2 === 0)
    val bn = base.count()
    val bcnt = base.groupBy($"bucket").agg(count(lit(1)).as("bc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baselinePpm = (0L to 9L).map(b =>
      math.max(bcnt.getOrElse(b, 0L) * 1000000L / bn, 1L))
    // batch truth = the oracle-gated p163 entry itself
    val expected = graft.SparkEntry
      .queries("p163_psi_drift_hourly")(spark, sf)
      .collect()
      .map(r => r.getTimestamp(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(expected.size >= 4, s"fixture too sparse: ${expected.size}")

    val docs = all.filter($"doc_id" % 2 === 1)
      .withColumn("ts", expr(
        "timestamp_seconds(1767225600 + (doc_id * 97) % 172800)"))
      .select($"ts", $"doc_id", $"n_chars")
    val dir = Files.createTempDirectory("psistream-docs").toString
    val ckpt = Files.createTempDirectory("psistream-ckpt").toString
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = TokenStreams.psiDriftStream(stream, baselinePpm,
        windowDur = "1 hour", watermark = "960 hours")
      .writeStream.format("memory").queryName("psi_drift")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // ragged doc_id bands, never window-aligned
      Seq(0L -> 61L, 61L -> 207L, 207L -> 399L, 399L -> 100000L)
        .foreach { case (lo, hi) =>
          docs.filter($"doc_id" >= lo && $"doc_id" < hi)
            .coalesce(1).write.mode("append").parquet(dir)
          q.processAllAvailable()
        }
      // sentinel far past the watermark so every real window emits
      val sentinelTs = 1767225600L + 2000L * 3600
      Seq((new java.sql.Timestamp(sentinelTs * 1000), 999999L, 150L))
        .toDF("ts", "doc_id", "n_chars")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("psi_drift")
      .filter($"w_start" < new java.sql.Timestamp(
        (1767225600L + 1999L * 3600) * 1000))
      .collect()
      .map(r => r.getTimestamp(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected,
      s"stream psi drift diverged from the p163 batch entry:\n" +
        s"  stream: ${got.toSeq.sortBy(_._1.getTime)}\n" +
        s"  batch:  ${expected.toSeq.sortBy(_._1.getTime)}")
    spark.catalog.clearCache()
  }
}
