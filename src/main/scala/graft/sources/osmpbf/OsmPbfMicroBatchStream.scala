package graft.sources.osmpbf

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.pbf.EntityKind

/** File-arrival micro-batching for `.pbf` directories (the OSM
  * replication-diff pattern, SURVEY §2.2 "streaming"): each trigger scans
  * for files not seen in the previous offset and plans them with the same
  * byte-range partitioning and readers as the batch path.
  *
  * The offset is the sorted set of (path, size) already processed —
  * simple, restart-safe (files are immutable once written), and
  * side-effect free on the driver beyond the listing.
  */
class OsmPbfMicroBatchStream(
    requiredSchema: StructType,
    parseType: String,
    kinds: Set[EntityKind.Value],
    options: CaseInsensitiveStringMap,
    checkpointLocation: String) extends MicroBatchStream {

  private val dir = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("osmpbf stream: no path specified"))
  private val conf = new SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())
  private val maxBytes =
    SparkSession.active.sessionState.conf.filesMaxPartitionBytes

  private def listFiles(): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf.value)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getLen > 0 &&
        st.getPath.getName.endsWith(".pbf"))
      .map(st => (st.getPath.toString, st.getLen))
      .sortBy(_._1)
  }

  override def initialOffset(): Offset = OsmPbfOffset(Seq.empty)

  override def latestOffset(): Offset = OsmPbfOffset(listFiles())

  override def deserializeOffset(json: String): Offset =
    OsmPbfOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[OsmPbfOffset].files.map(_._1).toSet
    val fresh = end.asInstanceOf[OsmPbfOffset].files.filterNot(f => seen(f._1))
    val parts = mutable.ArrayBuffer.empty[InputPartition]
    for ((path, len) <- fresh) {
      var off = 0L
      while (off < len) {
        val to = math.min(off + maxBytes, len)
        parts += OsmPbfInputPartition(path, off, to)
        off = to
      }
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OsmPbfPartitionReaderFactory(requiredSchema, parseType, kinds, conf)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Offset = immutable snapshot of processed (path, size) pairs. */
final case class OsmPbfOffset(files: Seq[(String, Long)]) extends Offset {
  override def json(): String =
    files.map { case (p, l) =>
      s"""{"path":${OsmPbfOffset.q(p)},"len":$l}"""
    }.mkString("[", ",", "]")
}

object OsmPbfOffset {
  private[osmpbf] def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def fromJson(json: String): OsmPbfOffset = {
    // minimal parser for the fixed shape written by json() above
    val entry = """\{"path":"((?:[^"\\]|\\.)*)","len":(\d+)\}""".r
    OsmPbfOffset(entry.findAllMatchIn(json).map { m =>
      val path = m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
      (path, m.group(2).toLong)
    }.toSeq)
  }
}
