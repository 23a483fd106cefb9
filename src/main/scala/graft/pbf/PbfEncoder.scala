package graft.pbf

import java.io.{ByteArrayOutputStream, OutputStream}
import java.util.zip.Deflater

import scala.collection.mutable

/** OSM PBF ENCODER — the write side of the wire format the decode core
  * reads (hand-rolled against the public schemas, the same provenance as
  * `ProtoReader`: `lib/osmpbf-1.3.3.jar!/fileformat.proto` /
  * `osmformat.proto`; the reference implements no writer at all).
  *
  * Layout produced: one `OSMHeader` frame (required_features
  * OsmSchema-V0.6 + DenseNodes), then `OSMData` frames of up to
  * `entitiesPerBlock` entities each — nodes as ONE DenseNodes group
  * (delta/zigzag-packed ids/lats/lons, 0-delimited keys_vals), ways and
  * relations as their own groups with delta-coded refs/memids — each
  * block carrying its own stringtable (index 0 reserved blank,
  * osmformat.proto:125-133) and a zlib blob with `raw_size`.
  *
  * Coordinates encode at the default granularity 100 / offset 0:
  * raw = rint(deg * 1e7), the exact inverse of the decoder's
  * deg = 1e-9 * 100 * raw, so a decode -> encode -> decode round trip is
  * bit-stable (PbfEncoderSpec pins it on the reference fixture).
  * Version metadata (`info`) is not emitted — the common behavior of
  * extract writers; readers see the column as NULL.
  */
object PbfEncoder {

  val DefaultEntitiesPerBlock = 8000

  // ---- protobuf wire primitives (write side of ProtoReader) ----

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  private def writeVarint(out: OutputStream, v0: Long): Unit = {
    var x = v0
    while ((x & ~0x7fL) != 0) {
      out.write(((x & 0x7f) | 0x80).toInt)
      x >>>= 7
    }
    out.write(x.toInt)
  }

  private def writeKey(out: OutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, (field.toLong << 3) | wire)

  private def writeLenDelim(out: OutputStream, field: Int, payload: Array[Byte]): Unit = {
    writeKey(out, field, 2)
    writeVarint(out, payload.length.toLong)
    out.write(payload)
  }

  private def writeStr(out: OutputStream, field: Int, s: String): Unit =
    writeLenDelim(out, field, s.getBytes("UTF-8"))

  private def packedDeltaZigzag(out: OutputStream, field: Int, vs: Seq[Long]): Unit = {
    if (vs.isEmpty) return
    val b = new ByteArrayOutputStream()
    var prev = 0L
    vs.foreach { v => writeVarint(b, zigzag(v - prev)); prev = v }
    writeLenDelim(out, field, b.toByteArray)
  }

  private def packedVarints(out: OutputStream, field: Int, vs: Seq[Long]): Unit = {
    if (vs.isEmpty) return
    val b = new ByteArrayOutputStream()
    vs.foreach(writeVarint(b, _))
    writeLenDelim(out, field, b.toByteArray)
  }

  // ---- block assembly ----

  /** Per-block string dictionary; index 0 is the reserved blank. */
  private final class StringTable {
    private val entries = mutable.ArrayBuffer[String]("")
    private val idx = mutable.HashMap[String, Int]("" -> 0)
    private var emptyAlias = -1
    def id(s: String): Int = idx.getOrElseUpdate(s, {
      entries += s; entries.size - 1
    })
    /** id for use inside DenseNodes `keys_vals`, where index 0 is the
      * NODE DELIMITER: the empty string must never encode as 0 there
      * (it would truncate the node's tag list and shift every following
      * node's tags — PbfEncoderFuzzSpec pins this), so it gets its own
      * non-zero duplicate entry. Duplicate table entries are format-
      * legal; only index 0 carries delimiter semantics.
      */
    def denseId(s: String): Int = {
      val i = id(s)
      if (i != 0) i
      else {
        if (emptyAlias < 0) { emptyAlias = entries.size; entries += "" }
        emptyAlias
      }
    }
    def payload: Array[Byte] = {
      val b = new ByteArrayOutputStream()
      entries.foreach(writeStr(b, 1, _))
      b.toByteArray
    }
  }

  private def rawCoord(deg: Double): Long = math.rint(deg * 1e7).toLong

  /** PrimitiveBlock payload for a slice of entities (nodes first as one
    * dense group, then ways, then relations — group-per-kind as the
    * format requires, osmformat.proto:115-122).
    */
  def blockPayload(entities: Seq[OsmEntity]): Array[Byte] = {
    val st = new StringTable
    val groups = new ByteArrayOutputStream()

    val nodes = entities.collect { case n: OsmNode => n }
    val ways = entities.collect { case w: OsmWay => w }
    val rels = entities.collect { case r: OsmRelation => r }

    if (nodes.nonEmpty) {
      val dense = new ByteArrayOutputStream()
      packedDeltaZigzag(dense, 1, nodes.map(_.id))
      packedDeltaZigzag(dense, 8, nodes.map(n => rawCoord(n.lat)))
      packedDeltaZigzag(dense, 9, nodes.map(n => rawCoord(n.lon)))
      if (nodes.exists(_.tags.nonEmpty)) {
        val kv = mutable.ArrayBuffer[Long]()
        nodes.foreach { n =>
          n.tags.foreach { case (k, v) =>
            kv += st.denseId(k).toLong; kv += st.denseId(v).toLong
          }
          kv += 0L
        }
        packedVarints(dense, 10, kv.toSeq)
      }
      val g = new ByteArrayOutputStream()
      writeLenDelim(g, 2, dense.toByteArray)
      writeLenDelim(groups, 2, g.toByteArray)
    }

    def tagFields(out: OutputStream, tags: Map[String, String]): Unit = {
      // materialize pairs once: keys and vals must stay index-aligned,
      // so never iterate the map twice
      val kv = tags.toSeq
      packedVarints(out, 2, kv.map(p => st.id(p._1).toLong))
      packedVarints(out, 3, kv.map(p => st.id(p._2).toLong))
    }

    if (ways.nonEmpty) {
      val g = new ByteArrayOutputStream()
      ways.foreach { w =>
        val m = new ByteArrayOutputStream()
        writeKey(m, 1, 0); writeVarint(m, w.id)
        tagFields(m, w.tags)
        packedDeltaZigzag(m, 8, w.refs.toSeq)
        writeLenDelim(g, 3, m.toByteArray)
      }
      writeLenDelim(groups, 2, g.toByteArray)
    }

    if (rels.nonEmpty) {
      val typeIds = Map("node" -> 0L, "way" -> 1L, "relation" -> 2L)
      val g = new ByteArrayOutputStream()
      rels.foreach { r =>
        val m = new ByteArrayOutputStream()
        writeKey(m, 1, 0); writeVarint(m, r.id)
        tagFields(m, r.tags)
        packedVarints(m, 8, r.members.map(mm => st.id(mm.role).toLong).toSeq)
        packedDeltaZigzag(m, 9, r.members.map(_.memberId).toSeq)
        packedVarints(m, 10,
          r.members.map(mm => typeIds.getOrElse(mm.memberType, 0L)).toSeq)
        writeLenDelim(g, 4, m.toByteArray)
      }
      writeLenDelim(groups, 2, g.toByteArray)
    }

    val block = new ByteArrayOutputStream()
    writeLenDelim(block, 1, st.payload) // stringtable FIRST — groups
    // reference string ids, and while protobuf fields may arrive in any
    // order, every real producer leads with the table
    block.write(groups.toByteArray)
    // granularity/offsets/date_granularity: defaults (100/0/1000), elided
    block.toByteArray
  }

  // ---- framing (fileformat.proto) ----

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Length-framed file block: int32-BE header size, BlobHeader{type,
    * datasize}, then the zlib Blob{raw_size, zlib_data}.
    */
  def writeFrame(out: OutputStream, blockType: String, payload: Array[Byte]): Unit = {
    val blob = new ByteArrayOutputStream()
    writeKey(blob, 2, 0); writeVarint(blob, payload.length.toLong)
    writeLenDelim(blob, 3, deflate(payload))
    val blobBytes = blob.toByteArray

    val header = new ByteArrayOutputStream()
    writeStr(header, 1, blockType)
    writeKey(header, 3, 0); writeVarint(header, blobBytes.length.toLong)
    val headerBytes = header.toByteArray

    out.write(Array[Byte](
      (headerBytes.length >>> 24).toByte, (headerBytes.length >>> 16).toByte,
      (headerBytes.length >>> 8).toByte, headerBytes.length.toByte))
    out.write(headerBytes)
    out.write(blobBytes)
  }

  def headerPayload: Array[Byte] = {
    val b = new ByteArrayOutputStream()
    writeStr(b, 4, "OsmSchema-V0.6")
    writeStr(b, 4, "DenseNodes")
    writeStr(b, 16, "graft")
    b.toByteArray
  }

  /** Stream entities into framed blocks on `out` (header frame first). */
  def writeAll(
      out: OutputStream,
      entities: Iterator[OsmEntity],
      entitiesPerBlock: Int = DefaultEntitiesPerBlock): Long = {
    writeFrame(out, "OSMHeader", headerPayload)
    var n = 0L
    entities.grouped(entitiesPerBlock).foreach { batch =>
      writeFrame(out, "OSMData", blockPayload(batch))
      n += batch.size
    }
    n
  }
}
