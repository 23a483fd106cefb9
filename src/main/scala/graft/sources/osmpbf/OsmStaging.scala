package graft.sources.osmpbf

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Verify-time PBF→parquet staging: DuckDB cannot parse PBF, so for
  * twelve rounds the osm* entries carried rows-only checks. This
  * module decodes the two fixtures ONCE per Verify run into
  * `<outDir>_staging/<table>` parquet (a SIBLING of outDir — anything
  * inside outDir is diffed by the driver harness as a query result),
  * and the osm oracles read them
  * via `read_parquet(...)` — giving the osm ANALYTICS (aggregations,
  * joins, tile binning, tag text stats) real rows+schema+hash oracle
  * rows.
  *
  * Honesty note on circularity: the staged frames are produced by the
  * SAME decoder the entries use, so the oracle gate proves the
  * analytics (independently recomputed by DuckDB over the staged
  * rows), NOT the decode. The decode is gated elsewhere and
  * non-circularly: PbfDecodeSpec / OsmPbfSourceSpec pin golden values
  * derived from the reference fixture's known content, the
  * split-invariance property tests pin realignment, and
  * OsmPbfWriteSpec pins the encoder against a decode round trip.
  * What the staged oracle ADDS is the full rows/schema/hash discipline
  * on every downstream computation — the same gate every other entry
  * has — plus schema/type-bridge coverage and run-to-run determinism.
  *
  * Scale shape: staging is Verify-only (the correctness harness), not
  * part of Bench or any production path; fixtures are KB-to-MB sized,
  * one decode pass each.
  */
object OsmStaging {

  /** Token the osm oracle SQL embeds; Verify substitutes the absolute
    * staging directory before writing oracle_sql.json.
    */
  val Token = "__GRAFT_OSM_STAGING__"

  def stage(spark: SparkSession, dir: String): Unit = {
    import graft.queries.OsmQueries.{fixturePath, samplePbfPath}
    def w(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$dir/$name")
    def read(path: String, tpe: Option[String]) = {
      val r = spark.read.format("osmpbf")
      tpe.foreach(t => r.option("parseType", t))
      r.load(path)
    }
    w(read(fixturePath, Some("node"))
      .select(col("id"), col("lat"), col("lon"), col("tags")), "nodes")
    w(read(fixturePath, Some("way"))
      .select(col("id"), col("nodes"), col("tags")), "ways")
    w(read(fixturePath, Some("relation"))
      .select(col("id"), col("members"), col("tags")), "rels")
    // unified read with the native metadata columns materialized as
    // plain columns (osm08's record keys; osm04/osm10/osm13/osm14)
    w(read(fixturePath, None)
      .select(col("id"), col("type"), col("lat"), col("lon"),
        col("tags"), col("_block_offset").as("block_offset"),
        col("_record_index").as("record_index")), "entities")
    w(read(samplePbfPath, Some("node"))
      .select(col("id"), col("lat"), col("lon")), "sample_nodes")
    w(OsmPbfHeader.df(spark, samplePbfPath, fixturePath), "header")
    // osm12a's companion: the deterministic 16 MB synthetic scale
    // fixture (same bytes every run — SyntheticPbf derives everything
    // from the block index), decoded once so DuckDB can recompute the
    // multi-split agreement values. ~2.6M rows of (id, type, lat, lon);
    // written WITHOUT coalesce(1) — the one staged frame big enough
    // that a single-task write would dominate staging time.
    w16(read(graft.pbf.SyntheticPbf.ensureFile(16L << 20), None)
      .select(col("id"), col("type"), col("lat"), col("lon")), dir)
  }

  private def w16(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$dir/synth16")
}
