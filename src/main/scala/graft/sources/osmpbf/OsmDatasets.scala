package graft.sources.osmpbf

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed facade over the osmpbf source (SURVEY §1.4: `Dataset[OsmNode]` /
  * `Dataset[OsmWay]` via case classes) — compile-time field checks for
  * the fixed per-entity schemas.
  */
object OsmDatasets {

  final case class NodeRow(
      id: Long, lat: Double, lon: Double, tags: Map[String, String])

  final case class WayNode(pos: Int, nodeId: Long)

  final case class WayRow(
      id: Long, nodes: Seq[WayNode], tags: Map[String, String])

  final case class MemberRow(role: String, memberId: Long, memberType: String)

  final case class RelationRow(
      id: Long, members: Seq[MemberRow], tags: Map[String, String])

  def nodes(spark: SparkSession, path: String): Dataset[NodeRow] = {
    import spark.implicits._
    spark.read.format("osmpbf").option("parseType", "node").load(path)
      .select("id", "lat", "lon", "tags").as[NodeRow]
  }

  def ways(spark: SparkSession, path: String): Dataset[WayRow] = {
    import spark.implicits._
    spark.read.format("osmpbf").option("parseType", "way").load(path)
      .select("id", "nodes", "tags").as[WayRow]
  }

  def relations(spark: SparkSession, path: String): Dataset[RelationRow] = {
    import spark.implicits._
    spark.read.format("osmpbf").option("parseType", "relation").load(path)
      .select("id", "members", "tags").as[RelationRow]
  }
}
