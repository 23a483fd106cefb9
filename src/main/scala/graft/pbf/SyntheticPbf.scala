package graft.pbf

import java.io.{BufferedOutputStream, ByteArrayOutputStream, FileOutputStream, OutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Deterministic synthetic OSM PBF writer — the scale fixture behind the
  * multi-split proof (osm12, OsmPbfMultiSplitSpec). The reference's own
  * fixture is 89 KB (a single split at any realistic setting), so the
  * splittable scan — THE custom component, mirroring the realignment
  * contract of `OsmPbfRecordReader.java:96-129` — needs a file bigger
  * than one split to demonstrate parallel speedup and split invariance
  * at scale. Blocks are raw (uncompressed) blobs: format-legal
  * (fileformat.proto:30), deterministic, and generation-cheap, so the
  * benchmarked cost is the scan itself, not Deflater throughput.
  *
  * Layout: an OSMHeader block, then dense-node blocks of `nodesPerBlock`
  * (ids ascending from blockIdx*1e6, lat/lon walking a deterministic
  * grid), with every 8th block a way block (ways + packed refs) so
  * kind-pruning has something to skip. Everything derives from the block
  * index — same bytes on every machine, no RNG state.
  */
object SyntheticPbf {

  val FormatVersion = 1
  val NodesPerBlock = 50000
  val WaysPerBlock = 2000
  val RefsPerWay = 30

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  private def writeVarint(out: OutputStream, v0: Long): Unit = {
    var x = v0
    while ((x & ~0x7fL) != 0) {
      out.write(((x & 0x7f) | 0x80).toInt)
      x >>>= 7
    }
    out.write(x.toInt)
  }

  private def varintLen(v0: Long): Int = {
    var x = v0
    var n = 1
    while ((x & ~0x7fL) != 0) { n += 1; x >>>= 7 }
    n
  }

  private def writeKey(out: OutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, (field.toLong << 3) | wire)

  private def writeLenDelim(out: OutputStream, field: Int, payload: Array[Byte]): Unit = {
    writeKey(out, field, 2)
    writeVarint(out, payload.length)
    out.write(payload)
  }

  private def writeStr(out: OutputStream, field: Int, s: String): Unit =
    writeLenDelim(out, field, s.getBytes("UTF-8"))

  /** Packed field of zigzag varints from a delta generator. */
  private def writePackedSVarints(
      out: ByteArrayOutputStream, field: Int, n: Int, delta: Int => Long): Unit = {
    var bytes = 0
    var i = 0
    while (i < n) { bytes += varintLen(zigzag(delta(i))); i += 1 }
    writeKey(out, field, 2)
    writeVarint(out, bytes)
    i = 0
    while (i < n) { writeVarint(out, zigzag(delta(i))); i += 1 }
  }

  /** One dense-node block: ids blockIdx*1e6+1 ascending by 1; lat walks
    * up from a per-block base row, lon from a per-block base column —
    * deterministic, spread over the globe so tile/bbox queries have
    * selectivity.
    */
  def denseBlockPayload(blockIdx: Long, n: Int = NodesPerBlock): Array[Byte] = {
    val group = new ByteArrayOutputStream(n * 6 + 64)
    // stored unit at default granularity 100: degrees * 1e7
    val lat0 = ((blockIdx % 140) - 70) * 10000000L + 5000000L
    val lon0 = ((blockIdx * 37 % 360) - 180) * 10000000L + 5000000L
    val dense = new ByteArrayOutputStream(n * 6 + 48)
    writePackedSVarints(dense, 1, n, i => if (i == 0) blockIdx * 1000000L + 1 else 1L)
    writePackedSVarints(dense, 8, n, i => if (i == 0) lat0 else 7L)
    writePackedSVarints(dense, 9, n, i => if (i == 0) lon0 else 13L)
    writeLenDelim(group, 2, dense.toByteArray)
    blockOf(group.toByteArray)
  }

  /** One way block: `m` ways of `refs` node refs each, ids ascending. */
  def wayBlockPayload(blockIdx: Long, m: Int = WaysPerBlock,
      refs: Int = RefsPerWay): Array[Byte] = {
    val group = new ByteArrayOutputStream(m * (refs * 2 + 16))
    var w = 0
    while (w < m) {
      val way = new ByteArrayOutputStream(refs * 2 + 16)
      writeKey(way, 1, 0)
      writeVarint(way, blockIdx * 1000000L + w + 1)
      // refs point into the node id space of the PREVIOUS dense block
      writePackedSVarints(way, 8, refs,
        i => if (i == 0) (blockIdx - 1) * 1000000L + w + 1 else 1L)
      writeLenDelim(group, 3, way.toByteArray)
      w += 1
    }
    blockOf(group.toByteArray)
  }

  /** Wrap one primitive-group payload into a PrimitiveBlock: stringtable
    * (the mandatory blank entry) + group.
    */
  private def blockOf(group: Array[Byte]): Array[Byte] = {
    val block = new ByteArrayOutputStream(group.length + 16)
    val st = new ByteArrayOutputStream(8)
    writeStr(st, 1, "")
    writeLenDelim(block, 1, st.toByteArray)
    writeLenDelim(block, 2, group)
    block.toByteArray
  }

  /** Length-framed file block: big-endian int32 header size, BlobHeader
    * {type, datasize}, then a raw Blob wrapping `payload`. Returns the
    * EXACT number of bytes written, so `write` can guarantee the
    * at-least-targetBytes contract (an undercounting estimate would make
    * ensureFile's size check fail forever and regenerate on every run).
    */
  def writeFrame(out: OutputStream, blockType: String, payload: Array[Byte]): Long = {
    val blob = new ByteArrayOutputStream(payload.length + 8)
    writeLenDelim(blob, 1, payload) // Blob.raw
    val header = new ByteArrayOutputStream(32)
    writeStr(header, 1, blockType)
    writeKey(header, 3, 0)
    writeVarint(header, blob.size().toLong)
    val h = header.toByteArray
    out.write(Array(((h.length >> 24) & 0xff).toByte, ((h.length >> 16) & 0xff).toByte,
      ((h.length >> 8) & 0xff).toByte, (h.length & 0xff).toByte))
    out.write(h)
    blob.writeTo(out)
    4L + h.length + blob.size()
  }

  private def headerPayload: Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    writeStr(out, 4, "OsmSchema-V0.6")
    writeStr(out, 4, "DenseNodes")
    writeStr(out, 16, "graft-synthetic")
    out.toByteArray
  }

  /** Write a file of at least `targetBytes` to `path` (atomic rename). */
  def write(path: String, targetBytes: Long): Unit = {
    val tmp = Files.createTempFile(
      Paths.get(path).getParent, ".synth", ".pbf.tmp")
    val out = new BufferedOutputStream(new FileOutputStream(tmp.toFile), 1 << 20)
    try {
      var written = writeFrame(out, "OSMHeader", headerPayload)
      var blockIdx = 1L
      while (written < targetBytes) {
        val payload =
          if (blockIdx % 8 == 0) wayBlockPayload(blockIdx)
          else denseBlockPayload(blockIdx)
        written += writeFrame(out, "OSMData", payload)
        blockIdx += 1
      }
    } finally out.close()
    Files.move(tmp, Paths.get(path), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Generate-once cache: the scale fixture is deterministic, so one file
    * per (version, size) serves every run on this machine.
    */
  def ensureFile(targetBytes: Long,
      dir: String = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-synth"): String = {
    Files.createDirectories(Paths.get(dir))
    val path = s"$dir/osm_v${FormatVersion}_${targetBytes}.pbf"
    val f = Paths.get(path)
    if (!Files.exists(f) || Files.size(f) < targetBytes) write(path, targetBytes)
    path
  }
}
