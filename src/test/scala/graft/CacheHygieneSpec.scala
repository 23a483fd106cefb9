package graft

import org.scalatest.funsuite.AnyFunSuite

/** Operators that persist() intermediates (the LSH dedup family) must
  * not leak cached frames across queries: Verify and Bench clear the
  * session cache after each query's action, and that has to actually
  * drop every block — a long-running session otherwise accumulates
  * MEMORY_AND_DISK frames until executors spill or OOM.
  */
class CacheHygieneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("cache-using queries leave no persisted RDDs after the per-query clear") {
    for (name <- Seq("p07_ngram_jaccard", "p08_minhash_lsh", "p17_neardup_lsh")) {
      SparkEntry.queries(name)(spark, sf).count()
      spark.catalog.clearCache()
      val leaked = spark.sparkContext.getPersistentRDDs
      assert(leaked.isEmpty,
        s"$name left ${leaked.size} persisted RDDs: ${leaked.values.map(_.name)}")
    }
  }
}
