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
  private def dataBlock(base: Long, n: Int): Array[Byte] = {
    val st = msg(str(1, ""))
    // deltas: first absolute, then +1 each
    val ids = base +: Seq.fill(n - 1)(1L)
    val lats = 100000000L +: Seq.fill(n - 1)(1000L)
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
}
