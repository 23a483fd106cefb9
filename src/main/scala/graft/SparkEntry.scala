package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every capability of the engine is exposed as a named query over the
  * driver-generated tables in `sfDir`; each query with a DuckDB-expressible
  * semantics also carries oracle SQL for the hash-match correctness gate.
  */
object SparkEntry {

  /** All registered capabilities, in stable name order. ("Stable"
    * means the ORDER is deterministic per build, not that the p-number
    * sequence is gapless: p127 was renamed to p126 mid-round-9 and the
    * number was retired rather than reused — reusing a retired number
    * would silently re-key historical bench/correctness artifacts.)
    */
  def allDefs: Seq[QueryDef] =
    (queries1 ++ queries2 ++ queries3 ++ queries4 ++ queries5 ++ queries6 ++
      queries7 ++ queries8 ++ queries9 ++ queries10 ++ queries11 ++
      queries12 ++ queries13 ++ queries14 ++ queries15 ++ queries16 ++
      queries17 ++ queries18 ++ queries19 ++ queries20 ++ queries21)
      .sortBy(_.name)

  private def queries1: Seq[QueryDef] = _root_.graft.queries.Relational.defs
  private def queries2: Seq[QueryDef] = _root_.graft.queries.Pipeline.defs
  private def queries3: Seq[QueryDef] = _root_.graft.queries.OsmQueries.defs
  private def queries4: Seq[QueryDef] = _root_.graft.queries.Relational2.defs
  private def queries5: Seq[QueryDef] = _root_.graft.queries.Relational3.defs
  private def queries6: Seq[QueryDef] = _root_.graft.queries.Relational4.defs
  private def queries7: Seq[QueryDef] = _root_.graft.queries.Pipeline2.defs
  private def queries8: Seq[QueryDef] = _root_.graft.queries.Relational5.defs
  private def queries9: Seq[QueryDef] = _root_.graft.queries.Pipeline3.defs
  private def queries10: Seq[QueryDef] = _root_.graft.queries.Pipeline4.defs
  private def queries11: Seq[QueryDef] = _root_.graft.queries.Relational6.defs
  private def queries12: Seq[QueryDef] = _root_.graft.queries.Pipeline5.defs
  private def queries13: Seq[QueryDef] = _root_.graft.queries.Relational7.defs
  private def queries14: Seq[QueryDef] = _root_.graft.queries.Pipeline6.defs
  private def queries15: Seq[QueryDef] = _root_.graft.queries.Pipeline7.defs
  private def queries16: Seq[QueryDef] = _root_.graft.queries.Pipeline8.defs
  private def queries17: Seq[QueryDef] = _root_.graft.queries.Pipeline9.defs
  private def queries18: Seq[QueryDef] = _root_.graft.queries.Pipeline10.defs
  private def queries19: Seq[QueryDef] = _root_.graft.queries.Pipeline11.defs
  private def queries20: Seq[QueryDef] = _root_.graft.queries.Pipeline12.defs
  private def queries21: Seq[QueryDef] = _root_.graft.queries.Pipeline13.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q01 (scan + filter + hash aggregate) always yields its six
    * returnflag x linestatus groups, at any scale factor.
    */
  def entry(spark: SparkSession): DataFrame =
    allDefs.find(_.name == "q01_pricing_summary").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Bench-only
    * defs (timing-bearing output — osm12) are excluded: Verify/
    * CORRECTNESS sees only oracle-gateable entries, Bench runs
    * [[allDefs]].
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.filterNot(_.benchOnly).map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
