package graft.pbf

/** Decoded OSM entities — the engine's record model (SURVEY.md §1.2/§1.4).
  *
  * Unlike the reference's tagged union with a flattened `"k:v;"` tag string
  * (/root/reference/src/main/io/github/gballet/osmpbf/OsmPrimitive.java:5-12),
  * tags are a genuine string→string map and ways/relations carry typed
  * member arrays.
  */
sealed trait OsmEntity {
  def id: Long
  def tags: Map[String, String]
  def info: Option[OsmInfo]
}

/** Version metadata (osmformat.proto:136-171); dropped by the reference. */
final case class OsmInfo(
    version: Int,
    timestampMs: Long,
    changeset: Long,
    uid: Int,
    user: String,
    visible: Boolean)

final case class OsmNode(
    id: Long,
    lat: Double,
    lon: Double,
    tags: Map[String, String],
    info: Option[OsmInfo]) extends OsmEntity

final case class OsmWay(
    id: Long,
    refs: Array[Long],
    tags: Map[String, String],
    info: Option[OsmInfo]) extends OsmEntity

final case class OsmMember(role: String, memberId: Long, memberType: String)

final case class OsmRelation(
    id: Long,
    members: Array[OsmMember],
    tags: Map[String, String],
    info: Option[OsmInfo]) extends OsmEntity

/** ChangeSet primitive (osmformat.proto:174-189) — id-only by spec; the
  * reference never decodes these (format-legal data silently dropped).
  * Not part of the unified `all` view (real-world planet files carry no
  * changeset groups); selected explicitly via `parseType=changeset`.
  */
final case class OsmChangeSet(id: Long) extends OsmEntity {
  override def tags: Map[String, String] = Map.empty
  override def info: Option[OsmInfo] = None
}

/** Which primitive kinds to decode — scan-time pruning (SURVEY §2.1 #10).
  * Unlike the reference's bare int with a dead default (defect D5), the
  * selection is explicit and `All` is supported.
  */
object EntityKind extends Enumeration {
  val Node, Way, Relation, ChangeSet = Value
}
