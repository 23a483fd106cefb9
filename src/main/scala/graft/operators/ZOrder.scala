package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the data-layout operator behind
  * multi-dimensional file-skipping: sort or partition by the interleaved
  * key and every co-located chunk covers a small bounding box in BOTH
  * dimensions, so min/max file statistics prune point and box queries on
  * either column (a single-column sort gives this for one dimension
  * only). At 100 TB this is a write-time layout choice: the z-key is a
  * pure per-row bit-arithmetic expression (codegen'd built-ins, no UDF,
  * no shuffle of its own) feeding `sortWithinPartitions`/`partitionBy`
  * — and the same arithmetic runs in any engine, so layout decisions
  * stay oracle-checkable.
  */
object ZOrder {

  private val steps: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spread the low 16 bits of `x` to even bit positions (0, 2, 4, …):
    * the classic shift-or-mask ladder.
    */
  def spread16(x: Column): Column =
    steps.foldLeft(x) { case (e, (sh, m)) =>
      (e.bitwiseOR(shiftleft(e, sh))).bitwiseAND(lit(m))
    }

  /** 32-bit Morton key of two non-negative dimensions (each reduced to
    * its low 16 bits): a's bits land even, b's land odd.
    */
  def interleave16(a: Column, b: Column): Column =
    spread16(a % 65536).bitwiseOR(shiftleft(spread16(b % 65536), 1))

  /** The identical ladder as SQL text, for oracle construction. */
  def spread16Sql(e: String): String =
    steps.foldLeft(s"CAST($e AS BIGINT)") { case (s, (sh, m)) =>
      s"(($s | ($s << $sh)) & $m)"
    }

  def interleave16Sql(a: String, b: String): String =
    s"(${spread16Sql(s"$a % 65536")} | (${spread16Sql(s"$b % 65536")} << 1))"
}
