package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for a set of declared queries to files —
  * the plan evidence the optimization rounds commit under plans/rNN/.
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> [prefixes]
  *   suffix   appended to each file name (e.g. "before" / "after")
  *   prefixes comma-separated name prefixes; empty/absent = all queries
  *
  * The plan is captured from the ANALYZED+optimized query exactly as the
  * bench would run it (same session shape: local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions=cpus, UTC, TIME type on). Nothing is executed —
  * `explain` stops at planning, so AQE final plans are not visible here;
  * the committed files show the static plan shape (Exchange count, join
  * strategy, PushedFilters/ReadSchema, codegen spans), which is what the
  * plan-diff claims in OPTIMIZATION_rNN.md reference.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val prefixes =
      if (args.length > 3)
        args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.timeType.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val defs = graft.SparkEntry.allDefs
      .filter(d => prefixes.isEmpty || prefixes.exists(d.name.startsWith))
    defs.foreach { d =>
      try {
        val df = d.fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(
          Paths.get(outDir, s"${d.name}_$suffix.txt"), plan)
        println(s"[explain] wrote ${d.name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          println(s"[explain] ${d.name} FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
