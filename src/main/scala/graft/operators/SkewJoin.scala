package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys at 100 TB.
  *
  * When one join key dominates the big side, a plain shuffle join sends
  * the whole hot key to one reducer; when the small side is also too big
  * to broadcast, the standard fix is salting: replicate every small-side
  * row `salts` times (salt 0..salts-1) and give each big-side row a
  * deterministic salt derived from a row-unique column, then join on
  * (key, salt). The hot key now spreads over `salts` reducers; the join
  * RESULT is provably unchanged (each big row meets exactly one copy of
  * each matching small row), which is what lets the q39 oracle hash-check
  * a salted plan against the plain SQL join.
  *
  * Spark's AQE skew-join handles this adaptively for sort-merge joins;
  * the explicit form remains the tool when AQE cannot see the skew
  * (first run, no stats) or for aggregate-below-join shapes.
  *
  * `big`/`small` must share no column names besides `bigKey`/`smallKey`.
  */
object SkewJoin {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      bigSaltSource: String,
      salts: Int = 8): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(col(bigSaltSource)), lit(salts.toLong)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
          saltedBig("_salt") === saltedSmall("_salt"))
      .drop("_salt")
  }
}
