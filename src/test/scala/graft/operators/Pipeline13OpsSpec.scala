package graft.operators

import graft.{SparkTestSession, SparkEntry}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 batch: the LSH-banded scale-first compositions must equal
  * the SAME composition run over the exact broadcast-capped pair
  * source — the in-frame exact twin, independent of the DuckDB
  * oracle's all-pairs recursive ladder. A banded candidate miss shows
  * up here as a missing/smaller cluster or a shifted fold-pair count.
  */
class Pipeline13OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def exactPairs: DataFrame =
    Similarity.nearDupPairsExact(
      graft.Tables.t(spark, sf, "embeddings"), "vec_id", "embedding",
      minSim = 0.4)

  test("p171 banded cluster inventory == the exact-pair composition") {
    import spark.implicits._
    val emb = graft.Tables.t(spark, sf, "embeddings")
    val labels = Dedup.connectedComponents(exactPairs)
    val want = labels
      .join(emb.select($"vec_id".as("id"), $"label"), Seq("id"))
      .groupBy($"cluster_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_members"),
        org.apache.spark.sql.functions.countDistinct($"label")
          .as("n_labels"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(want.nonEmpty, "fixture must contain >=0.4 near-dup clusters")
    val got = SparkEntry.queries("p171_semantic_clusters_lsh")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, s"banded != exact composition:\n got $got\nwant $want")
    spark.catalog.clearCache()
  }

  test("p172 banded fold-pair contamination == the exact-pair composition") {
    import spark.implicits._
    def fold(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      (hex.charAt(0).toInt * 16 + hex.charAt(1).toInt) % 5
    }
    val want = exactPairs.select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy { case (a, b) =>
        val (fa, fb) = (fold(a), fold(b))
        (math.min(fa, fb), math.max(fa, fb))
      }.view.mapValues(_.length.toLong).toMap
    assert(want.nonEmpty, "fixture must contain >=0.4 near-dup pairs")
    val got = SparkEntry.queries("p172_crossfold_contamination_lsh")(spark, sf)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got == want, s"banded != exact composition:\n got $got\nwant $want")
    spark.catalog.clearCache()
  }
}
