package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated name prefixes — dump only the
    // matching queries (local iteration; the driver runs unfiltered)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, Array.empty[String])
      case Array(s, o, f) => (s, o, f.split(","))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.timeType.enabled", "true") // q103; set at bootstrap, never mid-run
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // the oracle map depends only on SparkEntry — write it BEFORE the
    // query loop, so a fatal mid-run death (executor OOM, harness kill)
    // leaves every already-written result verifiable instead of zeroing
    // the round for want of oracle_sql.json. The osm oracles read
    // Verify-staged PBF→parquet frames: substitute the absolute staging
    // path into their read_parquet() calls here. The staging tree lives
    // NEXT TO outDir, not inside it: the driver harness diffs every
    // directory under outDir as a query result, and the staged list
    // columns (ways.nodes, entities) made its pandas sort choke — one
    // spurious `_staging` err row per round (VERDICT r13 ask #3).
    // LIFECYCLE (ADVICE r14): the tree must OUTLIVE this process — the
    // driver's DuckDB replay reads the staged frames via the absolute
    // paths substituted into oracle_sql.json AFTER Verify exits — so it
    // cannot be deleted at the end of main. Instead each run deletes
    // the previous run's tree up front (below), so staged parquet never
    // accumulates across runs even though harness cleanup scoped to
    // outDir does not see the sibling.
    val stagingDir = {
      val abs = Paths.get(outDir).toAbsolutePath
      // getParent is null when outDir IS a filesystem root (ADVICE
      // r14): fall back to a child of outDir itself — degenerate
      // layout (a root has no sibling slot; the pandas list-column
      // concern the sibling placement exists for is moot for a run
      // writing results to "/"), but NPE-free.
      Option(abs.getParent)
        .map(_.resolve(abs.getFileName.toString + "_staging"))
        .getOrElse(abs.resolve("_staging")).toString
    }
    locally { // clean the PREVIOUS run's staging tree (see LIFECYCLE)
      val p = Paths.get(stagingDir)
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => Files.delete(q))
        finally walk.close()
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace(
          graft.sources.osmpbf.OsmStaging.Token, stagingDir))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only.exists(n.startsWith) }
    // decode the PBF fixtures once so the osm oracle SQL has frames to
    // read (skipped when a subset run selects no osm entry)
    if (selected.keys.exists(_.startsWith("osm")))
      graft.sources.osmpbf.OsmStaging.stage(spark, stagingDir)
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // operator-internal persist() frames are scoped to one query
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
