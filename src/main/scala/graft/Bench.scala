package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall times at the target
  * scale factor. A warmup pass at sf0.001 first JIT-compiles the whole
  * query surface so the timed pass measures plans, not compilation.
  *
  * Failures never masquerade as fast runs: each query carries an `ok`
  * flag (the driver-facing `queries` map stays numeric), and a failed
  * query records the wall time up to the failure. Caches are cleared
  * after every query so operator-internal persist() frames cannot
  * accumulate across the 50+ query suite.
  *
  * `SPARK_GRAFT_ONLY=p08,q36` restricts the run to a comma-separated
  * subset (local iteration tool; the driver never sets it).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.allDefs.map(_.name)
      .filter(n => only.forall(f => f.exists(n.startsWith)))
    // warmup: run everything once at the smallest scale
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir).count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // Spark's ContextCleaner reclaims broadcast/shuffle state only when
      // the driver GCs; a large heap can go a whole 70-query suite
      // without one, and the accumulated state showed up as a one-off 8x
      // outlier on a mid-suite query. Nudge the cleaner OUTSIDE the timed
      // window so each query starts from a clean session.
      System.gc()
      (name, sec, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val oks = results.map { case (k, _, ok) => "\"" + k + "\":" + ok }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val nFailed = results.count(!_._3)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ok":$oks,"failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
