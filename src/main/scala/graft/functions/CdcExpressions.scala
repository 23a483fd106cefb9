package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Content-defined chunking (the gear rolling-hash family behind CDC
  * storage dedup — FastCDC et al., public) as a native codegen'd
  * expression: split a string at positions where a rolling hash of the
  * trailing characters hits a mask, so chunk boundaries move WITH the
  * content — an insertion early in a document shifts byte offsets but
  * re-synchronizes the remaining boundaries, which fixed-size blocks
  * never do. The expression returns the chunk SUBSTRINGS; hashing,
  * lengths and dedup accounting stay in built-in codegen'd functions
  * downstream, so only chunk hashes ever shuffle.
  *
  * Exact semantics (the DuckDB oracle replays them set-based):
  *  - characters are UTF-16 units (Java semantics; identical to code
  *    points on BMP text, the p42 charset precedent),
  *  - g(c) = (c * 2654435761) mod 2^32 (Knuth multiplicative mix),
  *  - h_i = (2 * h_{i-1} + g(c_i)) mod 2^32 — equivalently the windowed
  *    sum over the trailing 32 characters, which is what makes the
  *    boundary decision content-LOCAL and the hash never needs a reset,
  *  - a boundary closes after character i when the TOP maskBits bits of
  *    h_i are all zero — h_i < 2^(32 - maskBits); the trailing partial
  *    chunk is always emitted. The HIGH bits are load-bearing: bit b of
  *    h sees only the trailing b+1 characters (the shift pushes older
  *    contributions past it), so a low-bits mask would degrade the
  *    boundary predicate to a maskBits-gram lookup.
  *
  * No min/max chunk bounds here: the plain gear cut is the core
  * mechanism and keeps the boundary set a pure per-position predicate
  * (set-based oracle replay). The production min/max clamp lives in
  * [[GearChunksClamped]], whose sequential-stateful boundary selection
  * the oracle replays as a fold over these candidate positions.
  */
case class GearChunks(child: Expression, maskBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(maskBits >= 1 && maskBits <= 20,
    s"maskBits must be in [1, 20], got $maskBits")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gear_chunks expects a string, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    GearChunks.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GearChunks$$.MODULE$$.compute($c, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** FastCDC-shaped clamped variant of [[GearChunks]]: the rolling hash
  * and its mask predicate are IDENTICAL (h keeps rolling across
  * boundaries, so candidate positions stay content-local), but boundary
  * ACCEPTANCE is chunk-length-gated — a hash hit within `minLen`
  * characters of the last boundary is skipped, and a chunk is force-cut
  * the moment it reaches `maxLen` even with no hit. That makes boundary
  * selection sequential-stateful (the production chunker shape the
  * plain gear cut omits by design): the oracle replays it as a
  * list_reduce fold over the set-based candidate positions, inserting
  * the forced cuts between consecutive candidates arithmetically.
  *
  * The clamp trades resynchronization for bounded chunk sizes: after an
  * edit, a candidate that re-appears at the same content position can
  * still be REJECTED because the preceding boundary moved (len < minLen
  * there now) — so unlike the unclamped cut, boundaries downstream of
  * an edit are not guaranteed to realign (GearChunksClampedSpec pins an
  * instance). Every chunk except the trailing partial has length in
  * [minLen, maxLen]; the trailing partial is at most maxLen.
  */
case class GearChunksClamped(
    child: Expression, maskBits: Int, minLen: Int, maxLen: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(maskBits >= 1 && maskBits <= 20,
    s"maskBits must be in [1, 20], got $maskBits")
  require(minLen >= 1 && maxLen >= minLen,
    s"need 1 <= minLen <= maxLen, got [$minLen, $maxLen]")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gear_chunks_clamped expects a string, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    GearChunks.computeClamped(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      maskBits, minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GearChunks$$.MODULE$$.computeClamped(" +
        s"$c, $maskBits, $minLen, $maxLen)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GearChunks {
  import org.apache.spark.unsafe.types.UTF8String

  private val Mod32 = 0xFFFFFFFFL

  def computeClamped(
      s: UTF8String, maskBits: Int, minLen: Int, maxLen: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    val threshold = 1L << (32 - maskBits)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var h = 0L
    var start = 0
    var i = 0
    while (i < n) {
      val g = (str.charAt(i).toLong * 2654435761L) & Mod32
      h = ((h << 1) + g) & Mod32 // rolls across boundaries, like compute()
      val len = i - start + 1
      if ((len >= minLen && h < threshold) || len >= maxLen) {
        out += UTF8String.fromString(str.substring(start, i + 1))
        start = i + 1
      }
      i += 1
    }
    if (start < n) out += UTF8String.fromString(str.substring(start, n))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  def compute(s: UTF8String, maskBits: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    val threshold = 1L << (32 - maskBits)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var h = 0L
    var start = 0
    var i = 0
    while (i < n) {
      val g = (str.charAt(i).toLong * 2654435761L) & Mod32
      h = ((h << 1) + g) & Mod32
      if (h < threshold) {
        out += UTF8String.fromString(str.substring(start, i + 1))
        start = i + 1
      }
      i += 1
    }
    if (start < n) out += UTF8String.fromString(str.substring(start, n))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

object CdcFunctions {
  def gear_chunks(text: Column, maskBits: Int): Column =
    ColumnBridge.column(GearChunks(ColumnBridge.expression(text), maskBits))

  def gear_chunks_clamped(
      text: Column, maskBits: Int, minLen: Int, maxLen: Int): Column =
    ColumnBridge.column(GearChunksClamped(
      ColumnBridge.expression(text), maskBits, minLen, maxLen))
}
