package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Streaming osmpbf source: files dropped into a directory become
  * micro-batches; counts accumulate exactly once per file.
  */
class OsmPbfStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val fixture = "/root/reference/src/test/java/resources/temp.dat"

  test("file arrivals stream as micro-batches with exact counts") {
    val dir = Files.createTempDirectory("pbf-stream")
    val stream = spark.readStream.format("osmpbf")
      .option("parseType", "node").load(dir.toString)
    val q = stream.groupBy().count()
      .writeStream.format("memory").queryName("pbf_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("pbf_counts").collect().headOption
        .forall(_.getLong(0) == 0L))
      // drop the first file
      Files.copy(Paths.get(fixture), dir.resolve("a.pbf"),
        StandardCopyOption.REPLACE_EXISTING)
      q.processAllAvailable()
      assert(spark.table("pbf_counts").collect().head.getLong(0) == 9720L)
      // drop a second copy -> counts exactly double, first file not re-read
      Files.copy(Paths.get(fixture), dir.resolve("b.pbf"),
        StandardCopyOption.REPLACE_EXISTING)
      q.processAllAvailable()
      assert(spark.table("pbf_counts").collect().head.getLong(0) == 19440L)
    } finally q.stop()
  }

  test("watermark offset mode streams exactly once with bounded offsets") {
    val dir = Files.createTempDirectory("pbf-stream-wm")
    val stream = spark.readStream.format("osmpbf")
      .option("parseType", "node")
      .option("streamOffsetMode", "watermark")
      .load(dir.toString)
    val q = stream.groupBy().count()
      .writeStream.format("memory").queryName("pbf_counts_wm")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      Files.copy(Paths.get(fixture), dir.resolve("a.pbf"),
        StandardCopyOption.REPLACE_EXISTING)
      q.processAllAvailable()
      assert(spark.table("pbf_counts_wm").collect().head.getLong(0) == 9720L)
      Files.copy(Paths.get(fixture), dir.resolve("b.pbf"),
        StandardCopyOption.REPLACE_EXISTING)
      q.processAllAvailable()
      assert(spark.table("pbf_counts_wm").collect().head.getLong(0) == 19440L)
      // the offset carries only the watermark + same-instant names —
      // NOT the whole directory history
      val off = q.lastProgress.sources.head.endOffset
      assert(off.contains("watermark"), off)
      assert(!off.contains("a.pbf") || !off.contains("b.pbf") ||
        off.length < 200, s"offset should stay bounded: $off")
    } finally q.stop()
  }

  test("offset JSON round-trips for both encodings") {
    import graft.sources.osmpbf.{OsmPbfOffset, OsmPbfWatermarkOffset}
    val list = OsmPbfOffset(Seq(("/tmp/a \"quoted\".pbf", 10L), ("/tmp/b.pbf", 20L)))
    assert(OsmPbfOffset.fromJson(list.json()) == list)
    val wm = OsmPbfWatermarkOffset(1723400000123L, Seq("/x/y.pbf", "/x/z \"q\".pbf"))
    assert(OsmPbfWatermarkOffset.fromJson(wm.json()) == wm)
    assert(OsmPbfWatermarkOffset.fromJson(
      OsmPbfWatermarkOffset(-1L, Seq.empty).json()) ==
      OsmPbfWatermarkOffset(-1L, Seq.empty))
  }

  test("streaming projection prunes like the batch path") {
    val dir = Files.createTempDirectory("pbf-stream2")
    Files.copy(Paths.get(fixture), dir.resolve("a.pbf"))
    val stream = spark.readStream.format("osmpbf")
      .option("parseType", "way").load(dir.toString)
      .select("id")
    val q = stream.writeStream.format("memory").queryName("pbf_ways")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("pbf_ways").count() == 1348L)
      assert(spark.table("pbf_ways").agg(min("id")).collect()(0)
        .getLong(0) == 102348670L)
    } finally q.stop()
  }
}
