package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for p24's two phases (not shipped): pair generation
  * vs connected-components, at sf0.1, warm second pass.
  * Run: sbt 'Test/runMain graft.tools.CcProbe'
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    (1 to 2).foreach { pass =>
      val docs = graft.Tables.t(spark, dir, "documents")
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        val t1 = System.nanoTime()
        println(f"[ccprobe] pass $pass $tag%-24s ${(t1 - t0) / 1e9}%.2f s")
        t0 = t1
      }
      val n = graft.operators.Dedup.ngramJaccardPairsScoped(
        docs, "doc_id", "text", minJaccard = 0.35, maxShingleDf = 50) { pairs =>
        pairs.persist()
        val np = pairs.count()
        lap(s"pairs ($np)")
        val cc = graft.operators.Dedup.connectedComponents(pairs)
        lap("connectedComponents")
        val out = cc.count()
        pairs.unpersist()
        out
      }
      lap(s"drain ($n rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
