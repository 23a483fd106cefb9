package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-plan scale-budget guards — the p112 prefix-bucket pattern
  * (SetSimJoin.scala) generalized into a reusable operator.
  *
  * The problem class: a plan stays CORRECT at any scale (every shuffle
  * partial-aggregable, no driver funnel), but carries an assumption
  * that some intermediate frame is "dictionary-sized" — and some
  * dictionaries (word n-grams, distinct shingles) are corpus-order at
  * 100 TB, where the assumption silently degrades into spill-thrash or
  * an unpayable storage bill. A guard turns that silent degradation
  * into a FAIL-FAST with the remedy named in the error message.
  *
  * Mechanics (the p112 shape): the budget check is a 1-row aggregate
  * crossJoined (broadcast) into the guarded frame, so it RIDES THE
  * PLAN — no consumer can use the frame without the check, and under
  * budget the guard is a no-op filter on a constant-true column (the
  * oracle replay is unaffected). `raise_error` fires during execution
  * on the first consumer action.
  */
object ScaleGuards {

  /** Guard `df` on its own row count: identity while
    * `count(df) <= budget`, `raise_error` naming `what` and `remedy`
    * past it. Cost: one COUNT aggregate over `df` — place the guard on
    * an already-persisted or already-aggregated frame so the count is
    * a cheap second read, not a second corpus scan.
    */
  def cardinalityGuard(df: DataFrame, what: String, budget: Long,
      remedy: String): DataFrame = {
    val guard = df.agg(count(lit(1)).as("__n"))
      .select(when(col("__n") > budget,
          raise_error(concat(
            lit(s"$what: cardinality "), col("__n"),
            lit(s" exceeds budget=$budget — $remedy"))))
        .otherwise(lit(1L)).as("__g"))
    df.crossJoin(broadcast(guard)).filter(col("__g") === 1L)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Guard `df` on the row count of a SEPARATE witness frame: identity
    * while `count(witness) <= budget`, `raise_error` naming `what` and
    * `remedy` past it. Two shapes the self-count guard can't express:
    * a DICTIONARY assumption (witness = the distinct key frame whose
    * boundedness the plan's prose claims — p39's source labels) and a
    * VIOLATION assumption (witness = the rows breaking a per-row bound,
    * budget = 0 — p48's over-long documents). The witness aggregate is
    * a 1-row broadcast riding the plan like [[cardinalityGuard]]'s.
    */
  def witnessGuard(df: DataFrame, witness: DataFrame, what: String,
      budget: Long, remedy: String): DataFrame = {
    val guard = witness.agg(count(lit(1)).as("__n"))
      .select(when(col("__n") > budget,
          raise_error(concat(
            lit(s"$what: witness cardinality "), col("__n"),
            lit(s" exceeds budget=$budget — $remedy"))))
        .otherwise(lit(1L)).as("__g"))
    df.crossJoin(broadcast(guard)).filter(col("__g") === 1L)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
