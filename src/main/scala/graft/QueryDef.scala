package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed to the driver harness.
  *
  * @param name   stable id; also the output-parquet directory name in Verify
  * @param fn     (session, sfDir) => result; sfDir holds the parquet tables
  * @param oracle equivalent ANSI SQL for DuckDB over the same tables
  *               (None => driver records a weaker rows-only check)
  * @param benchOnly true for entries whose OUTPUT is wall-clock timing
  *               (osm12): they run in Bench — the artifact the timing
  *               belongs in — but are excluded from [[SparkEntry
  *               .queries]], so the correctness gate carries no
  *               structurally-unoracleable row; their deterministic
  *               analytic content is gated by an oracled twin
  *               (osm12a) instead.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    benchOnly: Boolean = false)

object Tables {
  /** All driver-generated tables (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // Some driver generations store events.ts as TIMESTAMP(NANOS), which
      // Spark's reader rejects by default; others store plain micros. Read
      // with nanosAsLong on (harmless for micros), then only rebuild the
      // timestamp when ts actually arrived as raw long nanos (the conversion
      // is lossless at micro precision; 1.7e18 ns > 2^53 rules out doubles).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions
            .timestamp_micros(org.apache.spark.sql.functions.expr("ts DIV 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // normalize to the session-zone timestamp type every query was
          // written against (sessions here pin UTC, so the instant is equal)
          raw.withColumn("ts",
            raw.col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw // already the session-zone timestamp type
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so query bodies can use spark.sql. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
