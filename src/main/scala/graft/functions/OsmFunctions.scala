package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column DSL for OSM-domain operations (SURVEY §7 "optional niceties") —
  * plain function composition over Catalyst built-ins, fully codegen'd.
  */
object OsmFunctions {

  /** 2048x2048 (or SxS) lat/lon grid tile id — the reference's canonical
    * downstream query (README.md:24-33): x=(lon+180)*S/360, y=(lat+90)*S/180,
    * tile = y*S+x.
    */
  def tileId(lat: Column, lon: Column, s: Int = 2048): Column =
    (floor((lat + 90) * s / 180) * s + floor((lon + 180) * s / 360)).cast("long")

  /** Reference-compat flattened tag string `"k1:v1;k2:v2;"` in map iteration
    * (= file) order — byte parity with OsmPbfRecordReader.java:194-204,
    * 242-262, including the trailing ';' and the lossiness for keys/values
    * containing ':' or ';' (documented quirk, SURVEY §1.2).
    */
  def osmTagsToString(tags: Column): Column =
    when(size(map_entries(tags)) > 0,
      concat(array_join(
        transform(map_entries(tags), e =>
          concat(e.getField("key"), lit(":"), e.getField("value"))), ";"),
        lit(";")))
      .otherwise(lit(""))

  /** Way geometry helper (SURVEY §2.2 "the domain join"): explode ordered
    * way nodes and equi-join against the node table to resolve coordinates.
    */
  def resolveWayGeometry(
      ways: org.apache.spark.sql.DataFrame,
      nodes: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val exploded = ways.select(col("id").as("way_id"),
        explode(col("nodes")).as("wn"))
      .select(col("way_id"), col("wn.pos").as("pos"), col("wn.nodeId").as("node_id"))
    exploded.join(nodes.select(col("id").as("node_id"),
        col("lat"), col("lon")), Seq("node_id"))
  }

  /** Relation geometry assembly — the multipolygon pattern implied by
    * the Relation schema (osmformat.proto:241-259, the entity type the
    * reference declares but never implements): a TWO-hop join,
    * relation -> member way (posexplode keeps member order, the ring
    * order of a multipolygon) -> way nodes -> node coordinates. Output
    * is one row per resolved point, ordered by `(member_pos, pos)`
    * within each relation; `role` (outer/inner) rides along so callers
    * can split rings. Members that are not ways, and ways/nodes outside
    * the extract, drop out of the inner joins — assembly resolves what
    * the file can resolve. Both hops are plain equi-joins after
    * map-side explodes: shuffle-partitioned on way_id/node_id at planet
    * scale, broadcast-able when the relation side is small.
    */
  def resolveRelationGeometry(
      relations: org.apache.spark.sql.DataFrame,
      ways: org.apache.spark.sql.DataFrame,
      nodes: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val members = relations.select(col("id").as("relation_id"),
        posexplode(col("members")).as(Seq("member_pos", "m")))
      .where(col("m.memberType") === "way")
      .select(col("relation_id"), col("member_pos"),
        col("m.role").as("role"), col("m.memberId").as("way_id"))
    members.join(resolveWayGeometry(ways, nodes), Seq("way_id"))
      .select(col("relation_id"), col("member_pos"), col("role"),
        col("way_id"), col("pos"), col("node_id"), col("lat"), col("lon"))
  }
}
