package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Streaming STATE INTROSPECTION via Spark's state data source — the
  * ops surface for a 100-TB streaming deployment: when a stateful query
  * misbehaves, the state store must be queryable offline (what keys are
  * held? how big? does the state equal a batch recompute?) without
  * stopping the job or writing debug code into it. Pins both formats:
  * `state-metadata` (operator inventory of a checkpoint) and
  * `statestore` (the key/value rows themselves), asserting the read-back
  * state equals the batch recomputation of the same input.
  */
class StateSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def runCountsStream(dir: String, ckpt: String): Unit = {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val agg = stream.groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val q = agg.writeStream.outputMode("update")
      .format("noop")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  test("state-metadata lists the stateful operator of a checkpoint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ss-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ss-ck").toString
    Seq((1L, 1.0), (2L, 2.0)).toDF("user_id", "value")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((1L, 3.0), (3L, 4.0)).toDF("user_id", "value")
      .coalesce(1).write.mode("append").parquet(dir)
    runCountsStream(dir, ckpt)

    val meta = spark.read.format("state-metadata").load(ckpt)
    val ops = meta.select("operatorName").as[String].collect().toSet
    assert(ops.contains("stateStoreSave"),
      s"expected the aggregation's state operator, got $ops")
    val parts = meta.select("numPartitions").as[Int].collect()
    assert(parts.forall(_ > 0))
  }

  test("Trigger.AvailableNow drains the backlog and terminates on its own") {
    import spark.implicits._
    // the operational batch-drain contract: process EVERYTHING present
    // at start across as many micro-batches as admission control needs,
    // then STOP — no manual processAllAvailable/stop choreography. The
    // mode a nightly catch-up job runs a streaming pipeline in.
    val dir = java.nio.file.Files.createTempDirectory("an-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("an-ck").toString
    Seq((1L, 1.0), (2L, 2.0)).toDF("user_id", "value")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((1L, 3.0), (3L, 4.0)).toDF("user_id", "value")
      .coalesce(1).write.mode("append").parquet(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .writeStream.outputMode("update").format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000),
      "AvailableNow query must terminate by itself")
    // admission control still applied: two input files -> two batches
    val committed = new java.io.File(ckpt, "commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(committed == 2, s"expected 2 committed batches, got $committed")
  }

  test("statestore rows equal the batch recompute of the same input") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ss2-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ss2-ck").toString
    // two micro-batches; user 1 spans both, so its state must show the
    // MERGED count — proving we read carried state, not batch output
    Seq((1L, 1.0), (2L, 2.0)).toDF("user_id", "value")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((1L, 3.0), (3L, 4.0), (1L, 5.0)).toDF("user_id", "value")
      .coalesce(1).write.mode("append").parquet(dir)
    runCountsStream(dir, ckpt)

    val state = spark.read.format("statestore").load(ckpt)
    // key is the grouping key struct; value is the aggregation buffer
    // (whose field carries the agg's internal name, `count`)
    val rows = state.selectExpr("key.user_id", "value.`count`")
      .as[(Long, Long)].collect().toMap
    assert(rows == Map(1L -> 3L, 2L -> 1L, 3L -> 1L),
      s"state must equal the batch recompute: $rows")
  }
}
