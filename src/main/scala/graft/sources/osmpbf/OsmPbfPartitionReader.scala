package graft.sources.osmpbf

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.pbf._

/** Executor-side reader: the Spark-native analogue of the reference's
  * RecordReader loop (SURVEY §3 stages 3-4), built on the pure decode core.
  * Only the columns in `requiredSchema` are materialized; tag / info /
  * member decoding is skipped entirely when pruned.
  */
class OsmPbfPartitionReaderFactory(
    requiredSchema: StructType,
    parseType: String,
    kinds: Set[EntityKind.Value],
    conf: SerializableConfiguration,
    permissive: Boolean = false,
    skips: SkipListener = SkipListener.Logging,
    limit: Int = -1) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[OsmPbfInputPartition]
    val base = new OsmPbfPartitionReader(p, requiredSchema, parseType, kinds,
      conf, permissive, skips)
    if (limit < 0) base
    else new PartitionReader[InternalRow] {
      // pushed LIMIT: stop decoding this byte range after `limit` rows
      private var remaining = limit
      override def next(): Boolean =
        remaining > 0 && base.next() && { remaining -= 1; true }
      override def get(): InternalRow = base.get()
      override def close(): Unit = base.close()
    }
  }

  /** Vectorized batches when the pruned schema is the dense-node fast
    * path (id/lat/lon) — e.g. the README tile query after pruning.
    * A pushed limit takes the row path (per-row cap, no partial batch
    * logic to get subtly wrong).
    */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    limit < 0 && OsmPbfColumnarReader.canServe(requiredSchema, kinds)

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[OsmPbfInputPartition]
    new OsmPbfColumnarPartitionReader(p, requiredSchema, conf, permissive, skips)
  }
}

/** Aggregate-pushdown readers: one partial row per partition holding
  * the pushed COUNT(*)/MIN(id)/MAX(id) values, no row materialization.
  * FAILFAST uses the ids-only walkers (counts never even decode ids;
  * min/max walk delta chains but skip lat/lon/strings/tags);
  * PERMISSIVE goes through the tolerant decode path for
  * scan-consistency.
  */
class OsmPbfAggReaderFactory(
    aggs: Seq[String],
    kinds: Set[EntityKind.Value],
    conf: SerializableConfiguration,
    permissive: Boolean,
    skips: SkipListener) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[OsmPbfInputPartition]
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _
      override def next(): Boolean =
        if (done) false
        else {
          // empty file path = the planner's placeholder for a scan with
          // no input files (count() must be 0, not NULL; min/max NULL)
          val (n, mn, mx) =
            if (p.filePath.isEmpty) (0L, Long.MaxValue, Long.MinValue)
            else {
              val in = new HadoopRangeReader(new Path(p.filePath), conf.value)
              try {
                if (aggs == Seq("count"))
                  (PbfScanner.countInRange(in, p.start, p.end, kinds,
                    permissive, skips), Long.MaxValue, Long.MinValue)
                else
                  PbfScanner.statsInRange(in, p.start, p.end, kinds,
                    permissive, skips)
              } finally in.close()
            }
          val values: Array[Any] = aggs.map {
            case "count" => n: Any
            case "min" => if (n == 0L) null else (mn: Any)
            case "max" => if (n == 0L) null else (mx: Any)
          }.toArray
          row = new GenericInternalRow(values)
          done = true
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** Positioned-read adapter over Hadoop's seekable stream, so the same scan
  * logic serves local files, HDFS, and object stores.
  */
final class HadoopRangeReader(
    path: Path,
    conf: org.apache.hadoop.conf.Configuration) extends RangeReader {
  private val fs = path.getFileSystem(conf)
  private val status = fs.getFileStatus(path)
  private val in = fs.open(path)
  override val size: Long = status.getLen
  override def read(off: Long, dst: Array[Byte], dstOff: Int, len: Int): Int = {
    val n = math.min(len.toLong, size - off).toInt
    if (n <= 0) return 0
    in.readFully(off, dst, dstOff, n)
    n
  }
  override def close(): Unit = in.close()
}

class OsmPbfPartitionReader(
    part: OsmPbfInputPartition,
    requiredSchema: StructType,
    parseType: String,
    kinds: Set[EntityKind.Value],
    conf: SerializableConfiguration,
    permissive: Boolean = false,
    skips: SkipListener = SkipListener.Logging) extends PartitionReader[InternalRow] {

  private val need = requiredSchema.fieldNames.toSet
  private val withInfo = need("info")
  private val withTags = need("tags")

  private val in = new HadoopRangeReader(new Path(part.filePath), conf.value)
  private val blocks =
    PbfScanner.scanBlocks(in, part.start, part.end, kinds, withInfo, permissive,
      skips)
  private var blockEntities: Iterator[OsmEntity] = Iterator.empty
  // provenance for the metadata columns (stable record identity)
  private var blockOffset: Long = -1L
  private var recordIndex: Long = -1L
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (!blockEntities.hasNext) {
      if (!blocks.hasNext) return false
      val (ref, it) = blocks.next()
      blockOffset = ref.start
      recordIndex = -1L
      blockEntities = it
    }
    recordIndex += 1
    current = convert(blockEntities.next())
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = in.close()

  // ---- entity -> InternalRow --------------------------------------------

  private val fieldWriters: Array[OsmEntity => Any] =
    requiredSchema.fields.map(f => writerFor(f.name))

  private def convert(e: OsmEntity): InternalRow = {
    val row = new GenericInternalRow(fieldWriters.length)
    var i = 0
    while (i < fieldWriters.length) {
      row.update(i, fieldWriters(i)(e))
      i += 1
    }
    row
  }

  private def writerFor(name: String): OsmEntity => Any = name match {
    case "type" => {
      case _: OsmNode => UTF8String.fromString("node")
      case _: OsmWay => UTF8String.fromString("way")
      case _: OsmRelation => UTF8String.fromString("relation")
    }
    case "id" => e => e.id
    case "lat" => { case n: OsmNode => n.lat; case _ => null }
    case "lon" => { case n: OsmNode => n.lon; case _ => null }
    case "tags" =>
      e => if (!withTags) null else mapData(e.tags)
    case "nodes" => {
      // ordered (pos, nodeId) structs, 1-based pos — Pig loader parity
      // (OSMPbfPigLoader.java:58-67)
      case w: OsmWay =>
        val arr = new Array[Any](w.refs.length)
        var i = 0
        while (i < w.refs.length) {
          arr(i) = new GenericInternalRow(Array[Any](i + 1, w.refs(i)))
          i += 1
        }
        new GenericArrayData(arr)
      case _ => null
    }
    case "members" => {
      case r: OsmRelation =>
        new GenericArrayData(r.members.map(m => new GenericInternalRow(
          Array[Any](UTF8String.fromString(m.role), m.memberId,
            UTF8String.fromString(m.memberType)))): Array[Any])
      case _ => null
    }
    case "info" =>
      e => e.info.map(i => new GenericInternalRow(Array[Any](
        i.version, i.timestampMs * 1000L, i.changeset, i.uid,
        UTF8String.fromString(i.user), i.visible))).orNull
    case "_file" =>
      val v = UTF8String.fromString(part.filePath)
      _ => v
    case "_block_offset" => _ => blockOffset
    case "_record_index" => _ => recordIndex
    case other =>
      throw new IllegalArgumentException(s"unknown osmpbf column '$other'")
  }

  private def mapData(tags: Map[String, String]): ArrayBasedMapData = {
    val keys = new Array[Any](tags.size)
    val vals = new Array[Any](tags.size)
    var i = 0
    tags.foreach { case (k, v) =>
      keys(i) = UTF8String.fromString(k)
      vals(i) = UTF8String.fromString(v)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}
