package graft.sources.osmpbf

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.pbf.{PbfBlockDecoder, PbfScanner}

/** User-facing OSMHeader access: the file-level metadata the reference
  * silently discards (its record reader skips every non-OSMData block,
  * OsmPbfRecordReader.java) — bounding box, feature lists, writing
  * program. Scans validate `required_features` at planning time (see
  * OsmPbfScan); this surfaces the same header as data.
  */
object OsmPbfHeader {

  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("has_header", BooleanType, nullable = false),
    StructField("bbox_left", DoubleType, nullable = true),
    StructField("bbox_bottom", DoubleType, nullable = true),
    StructField("bbox_right", DoubleType, nullable = true),
    StructField("bbox_top", DoubleType, nullable = true),
    StructField("required_features", ArrayType(StringType, containsNull = false)),
    StructField("optional_features", ArrayType(StringType, containsNull = false)),
    StructField("writing_program", StringType, nullable = true),
    StructField("source", StringType, nullable = true)))

  def read(spark: SparkSession, path: String): Option[PbfBlockDecoder.OsmHeader] = {
    val conf = spark.sessionState.newHadoopConf()
    val in = new HadoopRangeReader(new Path(path), conf)
    try PbfScanner.readHeader(in)
    finally in.close()
  }

  /** One row per file; files without an OSMHeader block (bare-data
    * fixtures) appear with `has_header = false` so lineage stays total.
    * Header blocks are O(KB) and one per file — driver-side reads, the
    * same planning-time cost the scan's validation pays.
    */
  def df(spark: SparkSession, paths: String*): DataFrame = {
    val rows = paths.map { p =>
      read(spark, p) match {
        case Some(h) =>
          Row(p, true,
            h.bbox.map(_._1).orNull, h.bbox.map(_._2).orNull,
            h.bbox.map(_._3).orNull, h.bbox.map(_._4).orNull,
            h.requiredFeatures, h.optionalFeatures,
            h.writingProgram.orNull, h.source.orNull)
        case None =>
          Row(p, false, null, null, null, null, Seq.empty[String],
            Seq.empty[String], null, null)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
