package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed to the driver harness.
  *
  * @param name   stable id; also the output-parquet directory name in Verify
  * @param fn     (session, sfDir) => result; sfDir holds the parquet tables
  * @param oracle equivalent ANSI SQL for DuckDB over the same tables
  *               (None => driver records a weaker rows-only check)
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  /** All driver-generated tables (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.parquet stores ts as TIMESTAMP(NANOS), which Spark's reader
      // rejects by default. Read it as raw long nanos and rebuild a micros
      // timestamp with integer division (values are micro-precision, so the
      // conversion is lossless; 1.7e18 ns > 2^53 rules out double division).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions
          .timestamp_micros(org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so query bodies can use spark.sql. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
