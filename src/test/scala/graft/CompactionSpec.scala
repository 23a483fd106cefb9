package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Output compaction — the small-files discipline: a 100 TB pipeline
  * that writes one file per shuffle partition litters the lake with
  * thousands of tiny files (each a namenode entry and a scan-planning
  * cost). The Spark-native fix is the AQE REBALANCE hint + advisory
  * partition size: the write coalesces to ~target-sized outputs at run
  * time from real map statistics, no manual repartition(n) guess.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles).toSeq.flatten
      .filter(f => f.getName.endsWith(".parquet") && f.getName.startsWith("part-"))

  test("REBALANCE + advisory size compacts a fragmenting write") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.shuffle.partitions")
      .map(k => k -> conf.getOption(k))
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
    conf.set("spark.sql.shuffle.partitions", "32") // cluster-shaped
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toFile
    try {
      // a shuffle-producing pipeline (groupBy doc) writes one file per
      // shuffle partition: with static partitioning (what a cluster
      // tuned for big stages runs — modeled here by disabling AQE
      // coalescing) that is 32 files for ~3 MB of data
      val docs = Tables.t(spark, sf, "documents")
        .groupBy(col("doc_id")).agg(first(col("text")).as("text"))
      val naiveDir = new java.io.File(out, "naive")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      docs.write.mode("overwrite").parquet(naiveDir.getPath)
      val naive = parquetFiles(naiveDir)

      // the fix: REBALANCE hint + advisory size, runtime-coalesced from
      // real map statistics
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      val compactDir = new java.io.File(out, "compact")
      docs.hint("rebalance")
        .write.mode("overwrite").parquet(compactDir.getPath)
      val compact = parquetFiles(compactDir)

      info(s"naive=${naive.size} files, rebalance=${compact.size} files " +
        s"(${compact.map(_.length()).sum / 1024 / 1024} MB total)")
      assert(naive.size > 4, s"fixture too small to fragment: ${naive.size}")
      assert(compact.size < naive.size / 2,
        s"rebalance must compact: ${compact.size} vs naive ${naive.size}")
      // losslessness: same rows either way
      assert(spark.read.parquet(compactDir.getPath).count() ==
        spark.read.parquet(naiveDir.getPath).count())
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(out)
    }
  }
}
