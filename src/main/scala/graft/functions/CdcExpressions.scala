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
  * No min/max chunk bounds: the plain gear cut is the core mechanism
  * and keeps the boundary set a pure per-position predicate (set-based
  * oracle replay); production chunkers add min/max clamps, which make
  * boundary selection sequential-stateful.
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

object GearChunks {
  import org.apache.spark.unsafe.types.UTF8String

  private val Mod32 = 0xFFFFFFFFL

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
}
