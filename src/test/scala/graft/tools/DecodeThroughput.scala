package graft.tools

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.Deflater

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pbf.ProtoWriter._
import graft.pbf.{EntityKind, PbfScanner}

/** Reproducible single-node decode-throughput probe (the README numbers):
  * generates a 500-block / 4M-dense-node zlib `.pbf` (the reference's
  * wire shape: delta-coded ids/lats/lons, granularity 100) and times
  *
  *   1. the pure decode core (PbfScanner iterator drain, no Spark),
  *   2. the DSv2 row path (count + lat aggregation),
  *   3. the DSv2 columnar path (id/lat/lon projection).
  *
  * Run: sbt 'Test/runMain graft.tools.DecodeThroughput'
  * The reference publishes no numbers and cannot compile offline
  * (protobuf-java absent — BASELINE.md), so these stand alone.
  */
object DecodeThroughput {

  private def beInt(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def zlibFrame(blockType: String, payload: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(payload); d.finish()
    val buf = new Array[Byte](payload.length * 2 + 64)
    val n = d.deflate(buf)
    d.end()
    val blob = msg(varint(2, payload.length), lenDelim(3, buf.take(n)))
    val header = msg(str(1, blockType), varint(3, blob.length))
    beInt(header.length) ++ header ++ blob
  }

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Pseudo-random walk deltas so zlib sees realistic entropy — constant
    * deltas compress 500k nodes into ~14 KiB and make decode look free.
    */
  private def denseBlock(base: Long, n: Int): Array[Byte] = {
    val st = msg(str(1, ""))
    val ids = base +: Seq.tabulate(n - 1)(i =>
      1L + math.floorMod(splitmix64(base + i), 4))
    val lats = 104769503L +: Seq.tabulate(n - 1)(i =>
      math.floorMod(splitmix64(base ^ i), 20001L) - 10000L)
    val lons = -641847472L +: Seq.tabulate(n - 1)(i =>
      math.floorMod(splitmix64(base + 7919L * i), 20001L) - 10000L)
    val dense = msg(packedSVarints(1, ids), packedSVarints(8, lats),
      packedSVarints(9, lons))
    msg(lenDelim(1, st), lenDelim(2, msg(lenDelim(2, dense))))
  }

  def main(args: Array[String]): Unit = {
    val blocks = 500
    val nodesPerBlock = 8000 // the format's typical dense-group size
    val total = blocks.toLong * nodesPerBlock
    val f = Files.createTempFile("throughput", ".pbf").toFile
    val out = new FileOutputStream(f)
    out.write(zlibFrame("OSMHeader", msg(str(4, "OsmSchema-V0.6"), str(4, "DenseNodes"))))
    for (b <- 0 until blocks)
      out.write(zlibFrame("OSMData", denseBlock(b.toLong * nodesPerBlock * 2, nodesPerBlock)))
    out.close()
    println(s"file: ${f.length() / 1024} KiB, $total nodes")

    def time[T](label: String)(body: => T): Unit = {
      // warm, then take the best of 3 (JIT + page cache steady state)
      body
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      val best = secs.min
      println(f"$label%-28s ${best}%6.2fs  ${total / best / 1e6}%5.2fM nodes/s")
    }

    time("decode core (no Spark)") {
      val it = PbfScanner.scanFile(f.getPath, Set(EntityKind.Node))
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      require(n == total, s"$n")
    }

    val spark = SparkSession.builder().master("local[1]")
      .config("spark.sql.shuffle.partitions", 1)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    time("DSv2 row path (1 core)") {
      val r = spark.read.format("osmpbf").option("parseType", "node")
        .load(f.getPath)
        .agg(count(lit(1)), sum("lat")).collect()
      require(r.head.getLong(0) == total)
    }

    time("DSv2 columnar (1 core)") {
      val r = spark.read.format("osmpbf").option("parseType", "node")
        .load(f.getPath).select("id", "lat", "lon")
        .agg(count(lit(1)), sum("lat"), sum("lon")).collect()
      require(r.head.getLong(0) == total)
    }

    time("count(*) pushdown (1 core)") {
      val n = spark.read.format("osmpbf").option("parseType", "node")
        .load(f.getPath).count()
      require(n == total)
    }

    spark.stop()
    f.delete()
  }
}
