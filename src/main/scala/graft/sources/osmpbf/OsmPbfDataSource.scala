package graft.sources.osmpbf

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("osmpbf")` — DataSource V2 entry point.
  *
  * Spark-native replacement for the reference's Hadoop InputFormat + Pig
  * LoadFunc pair (/root/reference/src/main/io/github/gballet/mapreduce/
  * input/OsmPbfInputFormat.java:13-20, pig/OSMPbfPigLoader.java:27-98).
  *
  * Options:
  *   - `parseType`: node | way | relation | all (default all). The
  *     reference's bare-int field defaulted to decoding nothing (defect
  *     D5); here the default is the unified view with a `type` column,
  *     and `type = '...'` filters push down to group-kind pruning.
  *   - `withInfo`: include the version-metadata struct column (default
  *     true; decode is skipped unless the column is actually required).
  */
class OsmPbfDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "osmpbf"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OsmPbfSchema.forType(
      options.getOrDefault("parseType", "all"),
      options.getBoolean("withInfo", true))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OsmPbfTable(schema,
      new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}

object OsmPbfSchema {

  val infoType: StructType = StructType(Seq(
    StructField("version", IntegerType),
    StructField("timestamp", TimestampType),
    StructField("changeset", LongType),
    StructField("uid", IntegerType),
    StructField("user", StringType),
    StructField("visible", BooleanType)))

  private val tagsType = MapType(StringType, StringType, valueContainsNull = false)

  /** Ordered `(pos, nodeId)` structs — Pig bag parity (README.md:55) with
    * order preserved by ArrayType (SURVEY §1.4).
    */
  val wayNodesType: ArrayType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("nodeId", LongType, nullable = false))), containsNull = false)

  val membersType: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType, nullable = false),
    StructField("memberId", LongType, nullable = false),
    StructField("memberType", StringType, nullable = false))), containsNull = false)

  def forType(parseType: String, withInfo: Boolean): StructType = {
    // id-only by spec and never carries info; not part of `all`
    // (planet files contain no changeset groups)
    if (parseType.equalsIgnoreCase("changeset"))
      return StructType(Seq(StructField("id", LongType, nullable = false)))
    val base = parseType.toLowerCase match {
      case "node" => StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("lat", DoubleType, nullable = false),
        StructField("lon", DoubleType, nullable = false),
        StructField("tags", tagsType)))
      case "way" => StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("nodes", wayNodesType),
        StructField("tags", tagsType)))
      case "relation" => StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("members", membersType),
        StructField("tags", tagsType)))
      case "all" => StructType(Seq(
        StructField("type", StringType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("lat", DoubleType),
        StructField("lon", DoubleType),
        StructField("nodes", wayNodesType),
        StructField("members", membersType),
        StructField("tags", tagsType)))
      case other => throw new IllegalArgumentException(
        s"parseType must be node|way|relation|changeset|all, got '$other'")
    }
    if (withInfo) base.add(StructField("info", infoType)) else base
  }
}

/** Hidden provenance columns, surfaced only when selected — parity with
  * the reference's byte-offset record key (OsmPbfRecordReader.java:68-72)
  * plus multi-file lineage. `_block_offset` is the frame start of the
  * entity's enclosing OSMData block; `_record_index` its ordinal within
  * that block, so (file, block, index) is a stable record identity.
  */
object OsmPbfMetadataColumns {
  val fields: StructType = StructType(Seq(
    StructField("_file", StringType, nullable = false),
    StructField("_block_offset", LongType, nullable = false),
    StructField("_record_index", LongType, nullable = false)))

  val names: Set[String] = fields.fieldNames.toSet

  val columns: Array[MetadataColumn] = fields.fields.map { f =>
    new MetadataColumn {
      override def name(): String = f.name
      override def dataType(): DataType = f.dataType
      override def isNullable: Boolean = false
    }
  }
}

class OsmPbfTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with SupportsMetadataColumns {

  override def name(): String =
    s"osmpbf(${options.getOrDefault("path", "")})"

  override def schema(): StructType = schema

  override def metadataColumns(): Array[MetadataColumn] =
    OsmPbfMetadataColumns.columns

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ info.options().asScala).asJava)
    new OsmPbfWriteBuilder(info, merged)
  }

  override def newScanBuilder(readOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ readOptions.asScala).asJava)
    new OsmPbfScanBuilder(schema, merged)
  }
}
