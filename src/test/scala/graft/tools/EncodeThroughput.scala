package graft.tools

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.Files

import graft.pbf.{OsmEntity, OsmNode, PbfEncoder, PbfScanner}

/** Reproducible single-node ENCODE-throughput probe for the write side
  * (the README number): streams 4M synthetic dense nodes (realistic
  * delta entropy: grid-walking coordinates, 1-in-3 tagged) through
  * [[graft.pbf.PbfEncoder]] into a zlib-framed file, then drains the
  * result back through the decode core to prove the bytes are valid and
  * count-complete.
  *
  * Run: sbt 'Test/runMain graft.tools.EncodeThroughput'
  */
object EncodeThroughput {
  def main(args: Array[String]): Unit = {
    val n = 4_000_000
    // pseudo-random WALK deltas (the DecodeThroughput entropy model):
    // constant deltas would let zlib fold 4M nodes into ~100 KB and make
    // the encode look free; splitmix-jittered walks give the wire
    // realistic per-node entropy
    def entities: Iterator[OsmEntity] = {
      var latRaw = 104769503L
      var lonRaw = -641847472L
      Iterator.tabulate(n) { i =>
        latRaw += math.floorMod(graft.functions.Hashing.splitmix64(i),
          20001L) - 10000L
        lonRaw += math.floorMod(graft.functions.Hashing.splitmix64(7919L * i),
          20001L) - 10000L
        OsmNode(1000000L + i * 3, 1e-9 * (100.0 * latRaw),
          1e-9 * (100.0 * lonRaw),
          if (i % 3 == 0) Map("highway" -> s"residential${i % 7}")
          else Map.empty,
          None)
      }
    }
    val f = Files.createTempFile("enc-bench", ".osm.pbf")
    // warmup (JIT) on a slice, then timed full pass
    val warm = new BufferedOutputStream(new FileOutputStream(f.toFile), 1 << 16)
    try PbfEncoder.writeAll(warm, entities.take(200000)) finally warm.close()
    val out = new BufferedOutputStream(new FileOutputStream(f.toFile), 1 << 16)
    val t0 = System.nanoTime()
    val written = try PbfEncoder.writeAll(out, entities) finally out.close()
    val encodeSec = (System.nanoTime() - t0) / 1e9
    val bytes = f.toFile.length()

    val t1 = System.nanoTime()
    var decoded = 0L
    val it = PbfScanner.scanFile(f.toString)
    while (it.hasNext) { it.next(); decoded += 1 }
    val decodeSec = (System.nanoTime() - t1) / 1e9
    require(decoded == written && decoded == n,
      s"round trip incomplete: wrote $written, decoded $decoded")
    println(f"encode: ${n / 1e6}%.1fM nodes in $encodeSec%.2fs = " +
      f"${n / encodeSec / 1e6}%.2fM nodes/s, ${bytes / 1e6}%.1f MB " +
      f"(${bytes / encodeSec / 1e6}%.1f MB/s compressed out)")
    println(f"decode-back: $decodeSec%.2fs = ${n / decodeSec / 1e6}%.2fM nodes/s")
    Files.delete(f)
  }
}
