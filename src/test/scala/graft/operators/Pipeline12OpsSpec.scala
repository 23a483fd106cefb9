package graft.operators

import java.math.{BigInteger => JBI}

import graft.{SparkTestSession, SparkEntry}
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 batch (cross-fold contamination, linear-MMD drift):
  * each entry is re-derived INDEPENDENTLY in plain JVM code over the
  * collected fixture — fold arithmetic via MessageDigest, MMD via
  * BigInteger — so a drift in the query's portable-arithmetic recipe
  * fails here even before the oracle gate sees it.
  */
class Pipeline12OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** The p166/p167 fold convention, implemented independently:
    * arithmetic on the first two md5 hex chars of the DECIMAL id
    * string, mod 5.
    */
  private def fold(id: Long): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    (hex.charAt(0).toInt * 16 + hex.charAt(1).toInt) % 5
  }

  test("p167 fold-pair counts equal an independent JVM re-derivation " +
      "from the exact pair set") {
    import spark.implicits._
    val pairs = Similarity.nearDupPairsExact(
        graft.Tables.t(spark, sf, "embeddings"), "vec_id", "embedding", 0.4)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    val want = pairs.groupBy { case (a, b) =>
      val (fa, fb) = (fold(a), fold(b))
      (math.min(fa, fb), math.max(fa, fb))
    }.view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("p167_crossfold_contamination")(spark, sf)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got == want, s"got $got want $want")
    // the ppm shares must partition the whole pair set (floor division
    // loses at most n_rows-1 ppm in total)
    val ppm = SparkEntry.queries("p167_crossfold_contamination")(spark, sf)
      .collect().map(_.getLong(3)).sum
    assert(ppm <= 1000000L && ppm > 1000000L - got.size,
      s"shares must sum to ~1e6: $ppm")
    spark.catalog.clearCache()
  }

  test("p168 MMD equals an independent BigInteger re-derivation over " +
      "the quantized fixture") {
    import spark.implicits._
    val rows = graft.Tables.t(spark, sf, "embeddings")
      .filter($"embedding".isNotNull)
      .select($"label", $"embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val byLabel = rows.groupBy(_._1)
    def sums(vs: Array[Array[Float]]): (Array[JBI], JBI) = {
      val dims = vs.head.length
      val s = Array.fill(dims)(JBI.ZERO)
      vs.foreach { v =>
        v.indices.foreach { d =>
          s(d) = s(d).add(JBI.valueOf(
            math.floor(v(d).toDouble * 1e9).toLong))
        }
      }
      (s, JBI.valueOf(vs.length.toLong))
    }
    val labels = byLabel.keys.toSeq.sorted
    // e12-quantized per-dim means (trunc toward zero — BigInteger
    // divide IS the sign-safe negate-divide-negate both engines run)
    def meanE12(s: JBI, n: JBI): JBI =
      s.multiply(JBI.valueOf(1000L)).divide(n)
    val want = (for {
      i <- labels.indices; j <- (i + 1) until labels.length
    } yield {
      val (sa, na) = sums(byLabel(labels(i)).map(_._2))
      val (sb, nb) = sums(byLabel(labels(j)).map(_._2))
      val v = sa.indices.map { d =>
        val t = meanE12(sa(d), na).subtract(meanE12(sb(d), nb))
        t.multiply(t)
      }.reduce(_.add(_))
      ((labels(i), labels(j)),
        v.divide(JBI.valueOf(1000000000000L)).longValueExact())
    }).toMap
    val got = SparkEntry.queries("p168_embedding_mmd_drift")(spark, sf)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(4))).toMap
    assert(got == want, s"got $got want $want")
    spark.catalog.clearCache()
  }
}
