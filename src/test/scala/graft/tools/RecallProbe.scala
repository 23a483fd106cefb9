package graft.tools

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t
import graft.operators.{Dedup, Similarity}

/** Scratch measurement harness (run manually) for picking the
  * self-oracle gate thresholds of p08/p09/p11/p16.
  */
class RecallProbe extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  ignore("measure recall/overlap per sf") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val docs = t(spark, dir, "documents")
      val emb = t(spark, dir, "embeddings")

      val exactPairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          minJaccard = 0.5, maxShingleDf = 50)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

      val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text")
        .filter(col("est_jaccard") >= 0.3)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val lshRecall =
        if (exactPairs.isEmpty) -1.0
        else exactPairs.count(lsh).toDouble / exactPairs.size

      def simRecall(maxH: Int): Double = {
        val sh = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = maxH)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        if (exactPairs.isEmpty) -1.0
        else exactPairs.count(sh).toDouble / exactPairs.size
      }

      val exactTop = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      def lshOverlap(maxH: Int): Double = {
        val a = Similarity.lshTopK(emb, "vec_id", "embedding", 0, 10,
            maxSketchHamming = maxH)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exactTop.count(a).toDouble / exactTop.size
      }
      def ivfOverlap(nProbe: Int): Double = {
        val a = Similarity.ivfTopK(emb, "vec_id", "embedding", 0, 10,
            nProbe = nProbe)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exactTop.count(a).toDouble / exactTop.size
      }

      println(s"[$sf] exactPairs=${exactPairs.size} lshRecall=$lshRecall " +
        s"simRecall(h3)=${simRecall(3)} simRecall(h8)=${simRecall(8)} " +
        s"simRecall(h16)=${simRecall(16)}")
      println(s"[$sf] lshTopK overlap h3=${lshOverlap(3)} h8=${lshOverlap(8)} " +
        s"ivf probe4=${ivfOverlap(4)} probe8=${ivfOverlap(8)}")
    }
  }
}
