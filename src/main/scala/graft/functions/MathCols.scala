package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact integer arithmetic over Columns where a double would drift
  * across engines.
  */
object MathCols {

  /** Exact integer square root: the unique s with s*s <= x < (s+1)*(s+1),
    * for 0 <= x < 2^53. A double sqrt seeds the answer (correctly rounded
    * by IEEE 754, so off by at most one after floor), then two integer
    * comparisons pin it exactly — the same fixup any oracle SQL can
    * replay verbatim, which is the point: no engine's sqrt/floor corner
    * behavior can desynchronize a hash-matched result.
    */
  def isqrt(x: Column): Column = {
    val s0 = floor(sqrt(x.cast("double"))).cast("long")
    val down = s0 - when(s0 * s0 > x, 1L).otherwise(0L)
    down + when((down + 1) * (down + 1) <= x, 1L).otherwise(0L)
  }
}
