package graft.sources

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Streaming osmpbf sink: epoch-named part files make micro-batch
  * replay IDEMPOTENT by construction (a replayed epoch overwrites its
  * own previous output, never duplicates it) — asserted here by running
  * the same input through a second stream with a fresh checkpoint into
  * the same output directory and proving the entity count is unchanged.
  */
class OsmPbfStreamWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("two micro-batches land as epoch files; replay does not duplicate") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("spbf-src").toString
    val out = java.nio.file.Files.createTempDirectory("spbf-out").toString
    def nodes(ids: Range) = ids
      .map(i => (i.toLong, 10.0 + i * 1e-7, -64.0 - i * 1e-7,
        Map("k" -> s"v$i")))
      .toDF("id", "lat", "lon", "tags")
    nodes(0 until 100).coalesce(1).write.mode("append").parquet(src)
    nodes(100 until 250).coalesce(1).write.mode("append").parquet(src)
    val schema = nodes(0 until 1).schema

    def runStream(): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory("spbf-ck").toString
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream.format("osmpbf")
        .option("parseType", "node").option("withInfo", "false")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }

    runStream()
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".osm.pbf")).map(_.getName).sorted
    assert(files.exists(_.startsWith("part-e000000")) &&
      files.exists(_.startsWith("part-e000001")),
      files.mkString(","))
    val read = () => spark.read.format("osmpbf")
      .option("parseType", "node").option("withInfo", "false").load(out)
    assert(read().count() == 250)
    assert(read().agg(org.apache.spark.sql.functions.sum($"id"))
      .head.getLong(0) == (0L until 250L).sum)

    // fresh checkpoint, same output dir: the replayed epochs rewrite the
    // same file names — exactly-once without a manifest
    runStream()
    assert(read().count() == 250)
  }
}
