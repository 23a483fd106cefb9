package graft.sources.osmpbf

import java.io.{BufferedOutputStream, File, FileOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.pbf._

/** `df.write.format("osmpbf").save(path)` — the write side of the
  * source: each input partition streams its rows through
  * [[graft.pbf.PbfEncoder]] into its own `part-*.osm.pbf` file under
  * `path` (the layout every distributed file sink uses — no shuffle, no
  * driver funnel; a 1000-executor write produces 1000 independent
  * framed-block files the splittable scan reads back in parallel).
  *
  * Accepted schemas are the reader's own (`all`, `node`, `way`,
  * `relation` — detected by column names), so scan -> transform -> write
  * round-trips without adapters. `mode("overwrite")` truncates existing
  * `*.osm.pbf` part files.
  *
  * Commit protocol (the classic temp-file-plus-rename): every task
  * attempt streams into a HIDDEN `.<final>.<taskId>.inprogress` file —
  * invisible to the reader (and to any Spark file listing, which skips
  * dot-files) — and only `DataWriter.commit()` renames it atomically to
  * its final name. So a speculative or zombie duplicate attempt never
  * interleaves bytes with the winner (each attempt owns its own temp;
  * the commit coordinator admits one commit per partition), and a task
  * that dies without `abort()` leaves only a hidden temp that the
  * driver-side commit sweeps — never a partial `part-*.osm.pbf` the
  * globbing reader would ingest.
  */
final class OsmPbfWriteBuilder(
    info: LogicalWriteInfo,
    options: CaseInsensitiveStringMap)
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  private def path: String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "osmpbf write requires a path"))

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new OsmPbfBatchWrite(info.schema(), path, doTruncate,
        options.getInt("entitiesPerBlock", PbfEncoder.DefaultEntitiesPerBlock))

    /** `writeStream.format("osmpbf")` — exactly-once by construction:
      * the epoch id is part of the file name, so a replayed micro-batch
      * (commit-marker loss, task retry) OVERWRITES its own previous
      * output instead of duplicating it — the same idempotence contract
      * the parquet streaming sink gets from its manifest, with no
      * manifest needed because (epoch, partition) fully names the unit
      * of work.
      */
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new OsmPbfStreamingWrite(info.schema(), path,
        options.getInt("entitiesPerBlock", PbfEncoder.DefaultEntitiesPerBlock))
  }
}

final class OsmPbfStreamingWrite(
    schema: StructType, path: String, perBlock: Int)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    new File(path).mkdirs()
    OsmPbfStreamingWriterFactory(schema, path, perBlock)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    // failed/zombie attempts of this epoch leave only hidden temps;
    // sweep them so replays do not accumulate scratch files
    OsmPbfWriteProtocol.sweepInProgress(path, f"part-e$epochId%06d")

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case OsmPbfCommit(file) => new File(file).delete(): Unit
      case _ => ()
    }
    OsmPbfWriteProtocol.sweepInProgress(path, f"part-e$epochId%06d")
  }
}

final class OsmPbfBatchWrite(
    schema: StructType, path: String, truncate: Boolean, perBlock: Int)
    extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new File(path)
    dir.mkdirs()
    if (truncate) Option(dir.listFiles()).foreach(_.foreach { f =>
      if (f.getName.endsWith(".osm.pbf")) { f.delete(): Unit }
    })
    new OsmPbfWriterFactory(schema, path, perBlock)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    // attempts that died without abort() left hidden temps; committed
    // files were renamed into place by their tasks
    OsmPbfWriteProtocol.sweepInProgress(path, "part-")

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case OsmPbfCommit(file) => new File(file).delete(): Unit
      case _ => ()
    }
    OsmPbfWriteProtocol.sweepInProgress(path, "part-")
  }
}

final case class OsmPbfCommit(file: String) extends WriterCommitMessage

/** Shared pieces of the temp-file-plus-rename protocol. */
object OsmPbfWriteProtocol {
  /** Hidden per-attempt temp name for a final part file: dot-prefixed
    * (skipped by file listings) and attempt-unique via taskId.
    */
  def inProgressFile(dir: String, finalName: String, taskId: Long): File =
    new File(dir, s".$finalName.$taskId.inprogress")

  /** Delete leftover temps whose FINAL name starts with `prefix` —
    * temp layout `.<finalName>.<taskId>.inprogress` means the hidden
    * name starts with `.<prefix>`.
    */
  def sweepInProgress(dir: String, prefix: String): Unit =
    Option(new File(dir).listFiles()).foreach(_.foreach { f =>
      if (f.getName.startsWith("." + prefix) &&
        f.getName.endsWith(".inprogress")) { f.delete(): Unit }
    })
}

final case class OsmPbfStreamingWriterFactory(
    schema: StructType, path: String, perBlock: Int)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new OsmPbfDataWriter(schema, path, partitionId, taskId, perBlock,
      fileName = Some(f"part-e$epochId%06d-p$partitionId%05d.osm.pbf"))
}

final class OsmPbfWriterFactory(schema: StructType, path: String, perBlock: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new OsmPbfDataWriter(schema, path, partitionId, taskId, perBlock)
}

/** Per-task writer: rows -> OsmEntity -> framed blocks. Buffers at most
  * one block of entities (`perBlock`) in memory.
  */
final class OsmPbfDataWriter(
    schema: StructType, path: String, partitionId: Int, taskId: Long,
    perBlock: Int, fileName: Option[String] = None)
    extends DataWriter[InternalRow] {

  private val file = new File(path,
    fileName.getOrElse(f"part-$partitionId%05d-$taskId.osm.pbf"))
  // every attempt writes its own hidden temp; only commit() renames it
  // into place (atomic on the same directory), so concurrent duplicate
  // attempts can never interleave bytes in a visible file
  private val tmp = OsmPbfWriteProtocol.inProgressFile(path, file.getName, taskId)
  private val out = new BufferedOutputStream(new FileOutputStream(tmp), 1 << 16)
  PbfEncoder.writeFrame(out, "OSMHeader", PbfEncoder.headerPayload)

  private val buf = new scala.collection.mutable.ArrayBuffer[OsmEntity](perBlock)

  // schema layout detection (the reader's own shapes)
  private val names = schema.fieldNames
  private def idxOf(n: String): Int = names.indexOf(n)
  private val iType = idxOf("type")
  private val iId = idxOf("id")
  private val iLat = idxOf("lat")
  private val iLon = idxOf("lon")
  private val iNodes = idxOf("nodes")
  private val iMembers = idxOf("members")
  private val iTags = idxOf("tags")
  require(iId >= 0, s"osmpbf write: schema must carry an id column, got " +
    schema.simpleString)

  private def tagsOf(row: InternalRow): Map[String, String] =
    if (iTags < 0 || row.isNullAt(iTags)) Map.empty
    else {
      val m = row.getMap(iTags)
      val ks = m.keyArray(); val vs = m.valueArray()
      (0 until m.numElements()).map(i =>
        ks.getUTF8String(i).toString -> vs.getUTF8String(i).toString).toMap
    }

  private def wayOf(row: InternalRow): OsmWay = {
    val arr = row.getArray(iNodes)
    // (pos, nodeId) structs, already in geometry order by contract
    val refs = (0 until arr.numElements()).map { i =>
      arr.getStruct(i, 2).getLong(1)
    }.toArray
    OsmWay(row.getLong(iId), refs, tagsOf(row), None)
  }

  private def relOf(row: InternalRow): OsmRelation = {
    val arr = row.getArray(iMembers)
    val members = (0 until arr.numElements()).map { i =>
      val s = arr.getStruct(i, 3)
      OsmMember(s.getUTF8String(0).toString, s.getLong(1),
        s.getUTF8String(2).toString)
    }.toArray
    OsmRelation(row.getLong(iId), members, tagsOf(row), None)
  }

  private def entityOf(row: InternalRow): OsmEntity =
    if (iType >= 0) {
      row.getUTF8String(iType).toString match {
        case "node" => OsmNode(row.getLong(iId), row.getDouble(iLat),
          row.getDouble(iLon), tagsOf(row), None)
        case "way" => wayOf(row)
        case "relation" => relOf(row)
        case other => throw new IllegalArgumentException(
          s"osmpbf write: unknown entity type '$other'")
      }
    } else if (iLat >= 0) OsmNode(row.getLong(iId), row.getDouble(iLat),
      row.getDouble(iLon), tagsOf(row), None)
    else if (iNodes >= 0) wayOf(row)
    else if (iMembers >= 0) relOf(row)
    else throw new IllegalArgumentException(
      s"osmpbf write: unrecognized schema ${schema.simpleString}")

  override def write(row: InternalRow): Unit = {
    buf += entityOf(row)
    if (buf.size >= perBlock) flush()
  }

  private def flush(): Unit = if (buf.nonEmpty) {
    PbfEncoder.writeFrame(out, "OSMData", PbfEncoder.blockPayload(buf.toSeq))
    buf.clear()
  }

  override def commit(): WriterCommitMessage = {
    flush(); out.close()
    // REPLACE_EXISTING: a replayed streaming epoch legitimately
    // overwrites its own previous (epoch, partition) output — the
    // sink's idempotence contract
    java.nio.file.Files.move(tmp.toPath, file.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    OsmPbfCommit(file.getPath)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Exception => () }
    tmp.delete(): Unit
  }

  override def close(): Unit = ()
}
