package graft.sources

import java.io.FileOutputStream
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.pbf.ProtoWriter._

/** End-to-end scan of a file we synthesize ourselves — independent of the
  * reference fixture, exercising the zstd codec and multi-block framing
  * through the full DSv2 path.
  */
class SyntheticPbfFileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def beInt(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def frame(blockType: String, payload: Array[Byte],
      codec: String): Array[Byte] = {
    val blob = codec match {
      case "raw" => msg(lenDelim(1, payload))
      case "zstd" =>
        val c = new io.airlift.compress.zstd.ZstdCompressor()
        val buf = new Array[Byte](c.maxCompressedLength(payload.length))
        val n = c.compress(payload, 0, payload.length, buf, 0, buf.length)
        msg(varint(2, payload.length), lenDelim(7, buf.take(n)))
    }
    val header = msg(str(1, blockType), varint(3, blob.length))
    beInt(header.length) ++ header ++ blob
  }

  /** One block of `n` dense nodes with ids/lats/lons derived from `base`. */
  private def dataBlock(base: Long, n: Int,
      latBase: Long = 100000000L): Array[Byte] = {
    val st = msg(str(1, ""))
    // deltas: first absolute, then +1 each
    val ids = base +: Seq.fill(n - 1)(1L)
    val lats = latBase +: Seq.fill(n - 1)(1000L)
    val lons = -200000000L +: Seq.fill(n - 1)(-1000L)
    val dense = msg(packedSVarints(1, ids), packedSVarints(8, lats),
      packedSVarints(9, lons))
    msg(lenDelim(1, st), lenDelim(2, msg(lenDelim(2, dense))))
  }

  private lazy val path: String = {
    val f = Files.createTempFile("synth", ".pbf").toFile
    val out = new FileOutputStream(f)
    out.write(frame("OSMHeader", msg(str(4, "OsmSchema-V0.6")), "raw"))
    out.write(frame("OSMData", dataBlock(1000, 50), "zstd"))
    out.write(frame("OSMData", dataBlock(5000, 30), "raw"))
    out.close()
    f.getPath
  }

  test("synthetic multi-codec file reads end-to-end") {
    val nodes = spark.read.format("osmpbf").option("parseType", "node")
      .load(path)
    assert(nodes.count() == 80)
    val ids = nodes.select("id").collect().map(_.getLong(0)).sorted
    assert(ids.take(3).toSeq == Seq(1000L, 1001L, 1002L))
    assert(ids.takeRight(1).head == 5029L)
    val r = nodes.filter(col("id") === 1000L).collect()(0)
    assert(math.abs(r.getAs[Double]("lat") - 10.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("lon") - -20.0) < 1e-12)
  }

  test("columnar path over the synthetic file") {
    val pruned = spark.read.format("osmpbf").option("parseType", "node")
      .load(path).select("id", "lat", "lon")
    assert(pruned.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(pruned.count() == 80)
  }

  test("mode=PERMISSIVE skips an undecodable block; FAILFAST throws") {
    // middle frame: valid BlobHeader, but the zlib payload is mangled
    // (framing intact, so realignment alone cannot save it)
    val goodA = frame("OSMData", dataBlock(1, 8), "raw")
    val goodB = frame("OSMData", dataBlock(200, 6), "raw")
    val d = new java.util.zip.Deflater()
    val payload = dataBlock(50, 5)
    d.setInput(payload); d.finish()
    val zbuf = new Array[Byte](payload.length * 2 + 64)
    val zn = d.deflate(zbuf)
    val corruptZlib = zbuf.take(zn)
    // scramble the middle of the deflate stream
    for (i <- zn / 2 until math.min(zn / 2 + 8, zn)) corruptZlib(i) = 0x55
    val blob = msg(varint(2, payload.length), lenDelim(3, corruptZlib))
    val hdr = msg(str(1, "OSMData"), varint(3, blob.length))
    val badFrame = beInt(hdr.length) ++ hdr ++ blob
    val f = Files.createTempFile("synth-permissive", ".pbf").toFile
    val out = new FileOutputStream(f)
    out.write(goodA); out.write(badFrame); out.write(goodB)
    out.close()
    val metrics = graft.sources.osmpbf.OsmPbfSkipMetrics.registered(spark)
    metrics.reset()
    val permissive = spark.read.format("osmpbf")
      .option("parseType", "node").option("mode", "PERMISSIVE")
      .load(f.getPath).select("id").collect().map(_.getLong(0)).sorted
    assert(permissive.length == 14, s"expected 8 + 6 surviving nodes")
    assert(permissive.head == 1L && permissive.last == 205L)
    // data loss is accounted, not just logged: one whole block skipped
    assert(metrics.skippedBlocks.value == 1L,
      s"skippedBlocks=${metrics.skippedBlocks.value}")
    assert(metrics.truncatedBlocks.value == 0L)
    intercept[Exception] { // default FAILFAST propagates the decode error
      spark.read.format("osmpbf").option("parseType", "node")
        .load(f.getPath).count()
    }
  }

  test("opt-in header bbox pruning skips whole files against lat/lon predicates") {
    // two headered extracts far apart, plus one bare-data file that has
    // no header and must be conservatively kept. Data lons are ~-20, so
    // the declared lon bbox brackets them (the invariant opt-in asserts).
    def bboxHeader(latLo: Long, latHi: Long): Array[Byte] =
      msg(lenDelim(1, msg(
        svarint(1, -21000000000L), svarint(2, -19000000000L), // lon l/r
        svarint(3, latHi), svarint(4, latLo))),               // top/bottom
        str(4, "OsmSchema-V0.6"), str(4, "DenseNodes"))
    val dir = Files.createTempDirectory("bbox-prune")
    def write(name: String, parts: Array[Byte]*): Unit = {
      val out = new FileOutputStream(dir.resolve(name).toFile)
      parts.foreach(out.write); out.close()
    }
    // A: nodes near lat 10, declared bbox [9, 11]
    write("a.pbf", frame("OSMHeader", bboxHeader(9000000000L, 11000000000L), "raw"),
      frame("OSMData", dataBlock(1, 10), "raw"))
    // B: nodes near lat 50, declared bbox [49, 51]
    write("b.pbf", frame("OSMHeader", bboxHeader(49000000000L, 51000000000L), "raw"),
      frame("OSMData", dataBlock(100, 7, latBase = 500000000L), "raw"))
    // C: headerless, nodes near lat 10
    write("c.pbf", frame("OSMData", dataBlock(200, 3), "raw"))

    import org.apache.spark.sql.functions.col
    val all = spark.read.format("osmpbf").option("parseType", "node")
      .option("bboxPruning", "true")
      .load(dir.toString)
    assert(all.count() == 20)
    val north = all.filter(col("lat") > 40)
    assert(north.count() == 7) // correctness: only B's nodes qualify
    // pruning: A is skipped at planning; headerless C must remain
    assert(north.rdd.getNumPartitions == 2,
      s"expected B + headerless C after bbox pruning, got ${north.rdd.getNumPartitions}")
    assert(north.queryExecution.executedPlan.toString
      .contains("bboxPrune"), "plan should advertise the pruning bounds")
    // a disjoint query prunes BOTH headered files
    assert(all.filter(col("lat") > 80).rdd.getNumPartitions == 1)
    assert(all.filter(col("lat") > 80).count() == 0)
    // DEFAULT (no option): the advisory bbox is never trusted — every
    // file is scanned, the filter applies row-wise only
    val noPrune = spark.read.format("osmpbf").option("parseType", "node")
      .load(dir.toString).filter(col("lat") > 40)
    assert(noPrune.rdd.getNumPartitions == 3)
    assert(noPrune.count() == 7)
    // wraparound bbox (left > right, antimeridian) is kept even opted-in
    val wrapDir = Files.createTempDirectory("bbox-wrap")
    val out = new FileOutputStream(wrapDir.resolve("w.pbf").toFile)
    out.write(frame("OSMHeader", msg(lenDelim(1, msg(
      svarint(1, 170000000000L), svarint(2, -175000000000L),
      svarint(3, 11000000000L), svarint(4, 9000000000L))),
      str(4, "OsmSchema-V0.6")), "raw"))
    out.write(frame("OSMData", dataBlock(1, 5), "raw"))
    out.close()
    assert(spark.read.format("osmpbf").option("parseType", "node")
      .option("bboxPruning", "true").load(wrapDir.toString)
      .filter(col("lon") < 0).count() == 5)
  }

  test("PERMISSIVE covers lazy per-group decode on row AND columnar paths") {
    // valid frame + valid zlib-free blob whose DENSE payload holds a
    // dangling varint continuation byte — inflate and block parse both
    // succeed, the failure only surfaces during lazy group decode
    val badDense = msg(
      lenDelim(1, msg(str(1, ""))),
      lenDelim(2, msg(lenDelim(2, lenDelim(1, Array(0x80.toByte))))))
    val f = Files.createTempFile("synth-lazy-corrupt", ".pbf").toFile
    val out = new FileOutputStream(f)
    out.write(frame("OSMData", dataBlock(1, 9), "raw"))
    out.write(frame("OSMData", badDense, "raw"))
    out.write(frame("OSMData", dataBlock(300, 4), "raw"))
    out.close()
    val metrics = graft.sources.osmpbf.OsmPbfSkipMetrics.registered(spark)
    metrics.reset()
    // columnar path (id/lat/lon projection)
    val columnar = spark.read.format("osmpbf")
      .option("parseType", "node").option("mode", "PERMISSIVE")
      .load(f.getPath).select("id", "lat", "lon")
    assert(columnar.count() == 13)
    // row path (tags keeps it off the columnar reader)
    val row = spark.read.format("osmpbf")
      .option("parseType", "node").option("mode", "PERMISSIVE")
      .load(f.getPath).select("id", "tags")
    assert(row.count() == 13)
    // each pass truncated the bad block mid-decode: accounted per scan
    assert(metrics.truncatedBlocks.value == 2L,
      s"truncatedBlocks=${metrics.truncatedBlocks.value}")
    assert(metrics.skippedBlocks.value == 0L)
    intercept[Exception] {
      spark.read.format("osmpbf").option("parseType", "node")
        .load(f.getPath).select("id").count()
    }
  }

  test("frame corruption: PERMISSIVE realigns and accounts, FAILFAST throws") {
    // valid block, then garbage (including a fake "OSMData" signature
    // embedded in junk that does NOT frame-validate), then a valid block
    val f = Files.createTempFile("synth-corrupt", ".pbf").toFile
    val out = new FileOutputStream(f)
    out.write(frame("OSMData", dataBlock(1, 10), "raw"))
    val junk = new Array[Byte](512)
    java.util.Arrays.fill(junk, 0x5a.toByte)
    System.arraycopy("OSMData".getBytes, 0, junk, 100, 7) // decoy signature
    out.write(junk)
    out.write(frame("OSMData", dataBlock(100, 7), "raw"))
    out.close()
    // PERMISSIVE: recover both real blocks, nothing else, loss accounted
    val metrics = graft.sources.osmpbf.OsmPbfSkipMetrics.registered(spark)
    metrics.reset()
    val ids = spark.read.format("osmpbf").option("parseType", "node")
      .option("mode", "PERMISSIVE")
      .load(f.getPath).select("id").collect().map(_.getLong(0)).sorted
    assert(ids.length == 17, s"expected 10 + 7 nodes, got ${ids.length}")
    assert(ids.take(3).toSeq == Seq(1L, 2L, 3L) && ids.last == 106L)
    assert(metrics.skippedBlocks.value >= 1L,
      "frame-level loss must be accounted, not silent")
    // FAILFAST (default): silent realignment would return a successful
    // result with rows missing — it must throw instead
    val e = intercept[Exception] {
      spark.read.format("osmpbf").option("parseType", "node")
        .load(f.getPath).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("corrupt PBF frame")), e.toString)
  }

  test("changeset primitive groups decode via parseType=changeset") {
    // a block holding 3 changesets (group field 5, id-only messages)
    // alongside a dense-node block
    val changesets = msg(
      lenDelim(5, msg(varint(1, 7001))),
      lenDelim(5, msg(varint(1, 7002))),
      lenDelim(5, msg(varint(1, 7003))))
    val block = msg(lenDelim(1, msg(str(1, ""))), lenDelim(2, changesets))
    val f = Files.createTempFile("synth-cs", ".pbf").toFile
    val out = new FileOutputStream(f)
    out.write(frame("OSMData", block, "raw"))
    out.write(frame("OSMData", dataBlock(1, 4), "raw"))
    out.close()
    val cs = spark.read.format("osmpbf").option("parseType", "changeset")
      .load(f.getPath)
    assert(cs.columns.toSeq == Seq("id"))
    assert(cs.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(7001L, 7002L, 7003L))
    // the unified view ignores changesets (planet-file semantics)
    assert(spark.read.format("osmpbf").load(f.getPath).count() == 4)
  }

  test("multi-path load survives commas in file names (real JSON parse)") {
    val dir = Files.createTempDirectory("synth,comma")
    val f = dir.resolve("part,one.pbf").toFile
    val out = new FileOutputStream(f)
    out.write(frame("OSMData", dataBlock(1, 5), "raw"))
    out.close()
    val n = spark.read.format("osmpbf").option("parseType", "node")
      .load(f.getPath, path) // two paths -> JSON-array "paths" option
      .count()
    assert(n == 85, s"expected 5 + 80 nodes, got $n")
  }

  test("OSMHeader is parsed: bbox, features, writing program") {
    val f = Files.createTempFile("synth-hdr", ".pbf").toFile
    val out = new FileOutputStream(f)
    val bbox = msg(svarint(1, -10000000000L), svarint(2, 20000000000L),
      svarint(3, 30000000000L), svarint(4, 5000000000L))
    out.write(frame("OSMHeader", msg(lenDelim(1, bbox),
      str(4, "OsmSchema-V0.6"), str(4, "DenseNodes"),
      str(5, "Sort.Type_then_ID"), str(16, "graft-test")), "raw"))
    out.write(frame("OSMData", dataBlock(1, 5), "raw"))
    out.close()
    val h = graft.sources.osmpbf.OsmPbfHeader.read(spark, f.getPath).get
    assert(h.requiredFeatures == Seq("OsmSchema-V0.6", "DenseNodes"))
    assert(h.optionalFeatures == Seq("Sort.Type_then_ID"))
    assert(h.writingProgram.contains("graft-test"))
    val (l, b, r, t) = h.bbox.get
    assert(math.abs(l - -10.0) < 1e-9 && math.abs(b - 5.0) < 1e-9 &&
      math.abs(r - 20.0) < 1e-9 && math.abs(t - 30.0) < 1e-9)
    // and the scan still reads the data that follows
    assert(spark.read.format("osmpbf").option("parseType", "node")
      .load(f.getPath).count() == 5)
  }

  test("a file requiring an unsupported feature fails at planning") {
    val f = Files.createTempFile("synth-bad", ".pbf").toFile
    val out = new FileOutputStream(f)
    out.write(frame("OSMHeader", msg(str(4, "OsmSchema-V0.6"),
      str(4, "LocationsOnWays")), "raw"))
    out.write(frame("OSMData", dataBlock(1, 5), "raw"))
    out.close()
    val e = intercept[Exception] {
      spark.read.format("osmpbf").option("parseType", "node")
        .load(f.getPath).count()
    }
    assert(e.getMessage.contains("LocationsOnWays"), e.getMessage)
    // explicit opt-out still reads (the data itself is decodable)
    assert(spark.read.format("osmpbf").option("parseType", "node")
      .option("validateHeader", "false").load(f.getPath).count() == 5)
  }

  test("metadata columns give a stable (file, block, index) record key") {
    import org.apache.spark.sql.functions.countDistinct
    val df = spark.read.format("osmpbf").option("parseType", "node")
      .load(path)
      .select(col("id"), col("_file"), col("_block_offset"), col("_record_index"))
    val rows = df.collect()
    assert(rows.length == 80)
    assert(rows.forall(_.getAs[String]("_file").contains("synth")))
    // two data blocks -> two distinct offsets, 50 + 30 records
    val byBlock = rows.groupBy(_.getAs[Long]("_block_offset"))
    assert(byBlock.size == 2)
    assert(byBlock.values.map(_.length).toSeq.sorted == Seq(30, 50))
    // record_index is a dense 0..n-1 ordinal within each block
    byBlock.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("_record_index")).sorted.toSeq ==
        (0L until rs.length).toSeq)
    }
    // (block, index) identifies each record uniquely
    assert(df.select(countDistinct(col("_block_offset"), col("_record_index")))
      .head().getLong(0) == 80)
    // metadata columns stay hidden unless selected
    assert(!spark.read.format("osmpbf").load(path).columns.contains("_file"))
  }
}
