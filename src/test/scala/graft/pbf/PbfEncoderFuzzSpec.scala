package graft.pbf

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Encoder round-trip PROPERTY test on adversarial synthetic entities —
  * the fixture round trip (OsmPbfWriteSpec) covers real-world value
  * distributions; this one covers the corners a systematic encode bug
  * hides in: negative and UNSORTED ids (dense delta chains with negative
  * deltas), multi-byte UTF-8 tag keys/values and empty strings
  * (stringtable byte-length vs char-length), zero-ref ways, zero-member
  * relations, coordinate extremes on the 1e-7 grid, and >1-block files
  * (per-block stringtable + delta-state reset).
  */
class PbfEncoderFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def roundTrip(entities: Seq[OsmEntity],
      perBlock: Int): Seq[OsmEntity] = {
    val f = java.nio.file.Files.createTempFile("enc-fuzz", ".osm.pbf")
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(f.toFile))
    try PbfEncoder.writeAll(out, entities.iterator, perBlock)
    finally out.close()
    val rows = spark.read.format("osmpbf").option("withInfo", "false")
      .load(f.toString).collect()
    rows.map { r =>
      r.getString(0) match {
        case "node" => OsmNode(r.getLong(1), r.getDouble(2), r.getDouble(3),
          Option(r.getMap[String, String](6)).map(_.toMap).getOrElse(Map.empty),
          None)
        case "way" => OsmWay(r.getLong(1),
          r.getSeq[org.apache.spark.sql.Row](4).map(_.getLong(1)).toArray,
          Option(r.getMap[String, String](6)).map(_.toMap).getOrElse(Map.empty),
          None)
        case "relation" => OsmRelation(r.getLong(1),
          r.getSeq[org.apache.spark.sql.Row](5).map(m =>
            OsmMember(m.getString(0), m.getLong(1), m.getString(2))).toArray,
          Option(r.getMap[String, String](6)).map(_.toMap).getOrElse(Map.empty),
          None)
      }
    }.toSeq
  }

  private def canon(es: Seq[OsmEntity]): Seq[String] = es.map {
    case n: OsmNode => s"n:${n.id}:${n.lat}:${n.lon}:${n.tags.toSeq.sorted}"
    case w: OsmWay => s"w:${w.id}:${w.refs.mkString(",")}:${w.tags.toSeq.sorted}"
    case r: OsmRelation => s"r:${r.id}:${r.members.mkString(",")}:${r.tags.toSeq.sorted}"
    case other => other.toString
  }.sorted

  test("adversarial entities survive encode -> decode bit-identically") {
    val rnd = new scala.util.Random(7)
    // decoder-representable coordinates: EXACTLY the decoder's own
    // expression (1e-9 * granularity * raw), not the algebraically-equal
    // raw*1e-7 — doubles make those differ in the last ulp
    def grid(x: Double): Double = 1e-9 * (100.0 * math.rint(x * 1e7))
    val entities: Seq[OsmEntity] =
      // unsorted, negative, duplicated-magnitude ids; extreme coords
      Seq(
        OsmNode(-5L, grid(89.9999999), grid(-179.9999999),
          Map("名前" -> "日本語", "" -> "empty-key-value", "e" -> ""), None),
        OsmNode(0L, 0.0, 0.0, Map.empty, None),
        OsmNode(Long.MaxValue / 4, grid(-90.0), grid(180.0),
          Map("k" -> "v"), None),
        OsmWay(-3L, Array.emptyLongArray, Map("empty" -> "way"), None),
        OsmWay(7L, Array(5L, -12L, 5L, 1000000000000L), Map.empty, None),
        OsmRelation(-1L, Array.empty[OsmMember], Map("no" -> "members"), None),
        OsmRelation(99L, Array(
          OsmMember("rôle", -4L, "node"),
          OsmMember("", 12L, "way"),
          OsmMember("outer", 99L, "relation")), Map.empty, None)
      ) ++ (0 until 500).map { i =>
        OsmNode(rnd.nextLong() % 1000000L,
          grid(rnd.nextDouble() * 180 - 90), grid(rnd.nextDouble() * 360 - 180),
          if (i % 3 == 0) Map(s"k$i" -> s"v${rnd.nextInt(5)}") else Map.empty,
          None)
      }
    // 64 entities per block forces multi-block output: per-block
    // stringtables and a delta-state reset at every boundary
    assert(canon(roundTrip(entities, perBlock = 64)) == canon(entities))
    // and a single-block encode agrees with the multi-block one
    assert(canon(roundTrip(entities, perBlock = 100000)) == canon(entities))
  }
}
