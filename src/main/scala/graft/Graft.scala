package graft

import org.apache.spark.sql.SparkSession

/** One-call library setup for an existing session: registers the native
  * SQL functions. New sessions can instead use
  * `SparkSession.builder().withExtensions(new VectorFunctions.GraftExtensions)`.
  */
object Graft {
  def enable(spark: SparkSession): SparkSession = {
    functions.VectorFunctions.register(spark)
    spark
  }
}
