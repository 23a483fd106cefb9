package graft.queries

import graft.QueryDef
import graft.functions.OsmFunctions
import org.apache.spark.sql.functions._

/** Queries over the OSM PBF source itself. DuckDB cannot read `.pbf`, so
  * these carry no oracle SQL (driver records rows-only checks); their
  * correctness gate is the golden-value ScalaTest suite against the
  * reference fixture (OsmPbfSourceSpec / PbfDecodeSpec).
  */
object OsmQueries {

  /** The reference's own test fixture (FIXTURES.md §1). */
  val fixturePath = "/root/reference/src/test/java/resources/temp.dat"

  /** The upstream sample.pbf bundled in the reference's osmpbf jar
    * (FIXTURES.md §3) — unlike temp.dat it carries a real OSMHeader
    * block, so it backs the header-surface query.
    */
  lazy val samplePbfPath: String = {
    val jar = new java.util.jar.JarFile(
      new java.io.File("/root/reference/lib/osmpbf-1.3.3.jar"))
    val entry = jar.getEntry("sample.pbf")
    val out = java.nio.file.Files.createTempFile("sample", ".pbf")
    val in = jar.getInputStream(entry)
    try java.nio.file.Files.copy(in, out,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally { in.close(); jar.close() }
    out.toString
  }

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "osm01_node_inventory",
      (s, _) => {
        import s.implicits._
        s.read.format("osmpbf").option("parseType", "node").load(fixturePath)
          .agg(
            count(lit(1)).as("n_nodes"),
            min($"id").as("min_id"), max($"id").as("max_id"),
            min($"lat").as("min_lat"), max($"lat").as("max_lat"),
            min($"lon").as("min_lon"), max($"lon").as("max_lon"))
      },
      None),

    QueryDef(
      // README.md:22-35 canonical query: 2048x2048 grid density
      "osm02_tile_density",
      (s, _) => {
        import s.implicits._
        s.read.format("osmpbf").option("parseType", "node").load(fixturePath)
          .withColumn("tile", OsmFunctions.tileId($"lat", $"lon"))
          .groupBy($"tile").agg(count(lit(1)).as("n"))
          .orderBy($"tile")
      },
      None),

    QueryDef(
      // the domain join: way refs -> node coordinates (SURVEY §2.2)
      "osm03_way_geometry",
      (s, _) => {
        import s.implicits._
        val ways = s.read.format("osmpbf").option("parseType", "way")
          .load(fixturePath)
        val nodes = s.read.format("osmpbf").option("parseType", "node")
          .load(fixturePath)
        OsmFunctions.resolveWayGeometry(ways, nodes)
          .groupBy($"way_id")
          .agg(count(lit(1)).as("n_points"),
            min($"lat").as("min_lat"), max($"lat").as("max_lat"))
          .orderBy($"way_id")
      },
      None),

    QueryDef(
      "osm04_tag_frequency",
      (s, _) => {
        import s.implicits._
        s.read.format("osmpbf").load(fixturePath)
          .select($"type", explode($"tags").as(Seq("k", "v")))
          .groupBy($"k").agg(count(lit(1)).as("n"),
            countDistinct($"v").as("n_values"))
          .orderBy($"n".desc, $"k")
          .limit(25)
      },
      None),

    QueryDef(
      "osm05_relation_members",
      (s, _) => {
        import s.implicits._
        s.read.format("osmpbf").option("parseType", "relation").load(fixturePath)
          .select($"id", explode($"members").as("m"))
          .groupBy($"m.memberType".as("member_type"), $"m.role".as("role"))
          .agg(count(lit(1)).as("n"))
          .orderBy($"member_type", $"role")
      },
      None),

    QueryDef(
      // reference-compat flattened "k:v;" tag strings (SURVEY §1.2 quirk)
      "osm06_tags_compat_string",
      (s, _) => {
        import s.implicits._
        s.read.format("osmpbf").option("parseType", "node").load(fixturePath)
          .filter(size(map_entries($"tags")) > 0)
          .select($"id", OsmFunctions.osmTagsToString($"tags").as("tags_str"))
          .orderBy($"id")
          .limit(100)
      },
      None),

    QueryDef(
      // OSMHeader surface: bbox + feature lists of a file that has one
      // (sample.pbf) alongside the bare-data fixture, proving totality
      "osm07_header_inventory",
      (s, _) => {
        import s.implicits._
        graft.sources.osmpbf.OsmPbfHeader.df(s, samplePbfPath, fixturePath)
          .select(
            // temp-file names vary per run; project stable identity
            when($"has_header", lit("sample.pbf")).otherwise(lit("temp.dat"))
              .as("file_kind"),
            $"has_header", $"bbox_left", $"bbox_bottom", $"bbox_right",
            $"bbox_top",
            array_join($"required_features", ";").as("required"),
            $"writing_program")
          .orderBy($"file_kind")
      },
      None),

    QueryDef(
      // multi-file scan with a lat predicate: sample.pbf (UK, ~51.77)
      // qualifies, temp.dat (Venezuela, ~10.4, headerless) is filtered
      // row-wise. Deliberately does NOT opt into bboxPruning: sample.pbf
      // itself carries nodes outside its declared bbox, the exact reason
      // the pruning is opt-in (SyntheticPbfFileSpec pins the opt-in
      // partition-count effect).
      "osm09_bbox_scan",
      (s, _) => {
        import s.implicits._
        s.read.format("osmpbf").option("parseType", "node")
          .load(samplePbfPath, fixturePath)
          .filter($"lat" > 40.0)
          .agg(
            count(lit(1)).as("n_north"),
            round(min($"lat"), 6).as("min_lat"),
            round(max($"lat"), 6).as("max_lat"),
            round(min($"lon"), 6).as("min_lon"),
            round(max($"lon"), 6).as("max_lon"))
      },
      None),

    QueryDef(
      // record-key metadata columns: per-block record counts — parity
      // with the reference's byte-offset record key
      "osm08_record_keys",
      (s, _) => {
        import s.implicits._
        s.read.format("osmpbf").load(fixturePath)
          .select($"id", $"type", col("_block_offset"), col("_record_index"))
          .groupBy($"_block_offset".as("block_offset"))
          .agg(
            count(lit(1)).as("n_records"),
            max($"_record_index").as("max_index"),
            countDistinct($"type").as("n_kinds"))
          .orderBy($"block_offset")
      },
      None),

    QueryDef(
      // COUNT(*) aggregate pushdown: the scan answers the count from the
      // decode-free varint counter (per-partition partials, no rows
      // materialized, string table untouched) — ~2x the row path, and
      // the inventory numbers must agree with the decoded scans
      // (OsmPbfCountPushdownSpec pins plan + equality).
      "osm10_count_pushdown",
      (s, _) => {
        import s.implicits._
        def counted(tpe: Option[String]): Long = {
          val r = s.read.format("osmpbf")
          tpe.foreach(t => r.option("parseType", t))
          r.load(fixturePath).count()
        }
        Seq(
          ("all", counted(None)),
          ("node", counted(Some("node"))),
          ("way", counted(Some("way"))))
          .toDF("scope", "n")
      },
      None)
  )
}
