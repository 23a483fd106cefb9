package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-level longest common subsequence against a FIXED reference
  * sequence — the kernel of ROUGE-L (Lin 2004, public), the metric an
  * eval-set decontamination pass runs between corpus documents and
  * held-out references: ROUGE-L's F (β=1) reduces to 2·LCS/(m+n), so
  * an exact integer LCS makes the whole metric integer-exact.
  *
  * Semantics pinned for the oracle replay:
  *  - the input text splits on single spaces (the corpus convention
  *    everywhere in this repo); the reference rides the plan as a
  *    token literal,
  *  - LCS over TOKENS (order-preserving, non-contiguous), classic
  *    O(n·m) two-row DP, token equality is exact string equality.
  *
  * Scale shape: the reference is a plan literal (a handful of tokens
  * per eval probe), so the per-row cost is O(doc_tokens · ref_tokens)
  * map-side — no shuffle, no state; the oracle replays the DP with a
  * windowed prefix-max CTE ladder over the row-sparse LCS recurrence
  * L[j][i] = max(L[j-1][i], max_{i'<=i, tok(i')=ref(j)} L[j-1][i'-1]+1).
  */
case class LcsTokens(child: Expression, ref: Seq[String])
    extends UnaryExpression {
  require(ref.nonEmpty && ref.size <= 64,
    "lcs_tokens reference must be 1..64 tokens")
  require(ref.forall(_.nonEmpty), "reference tokens must be non-empty")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lcs_tokens expects a string, got ${t.simpleString}")
    }

  @transient private lazy val refArr: Array[String] = ref.toArray

  override def nullSafeEval(input: Any): Any =
    LcsTokens.lcs(refArr, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("lcsRef", refArr,
      classOf[Array[String]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LcsTokens$$.MODULE$$.lcs($r, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LcsTokens {

  /** Two-row LCS DP: O(n·m) time, O(n) space. */
  def lcs(ref: Array[String], text: UTF8String): Int = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var j = 0
    while (j < ref.length) {
      val rj = ref(j)
      var i = 1
      while (i <= n) {
        val d = prev(i - 1) + (if (toks(i - 1) == rj) 1 else 0)
        val best0 = if (prev(i) > cur(i - 1)) prev(i) else cur(i - 1)
        cur(i) = if (d > best0) d else best0
        i += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      j += 1
    }
    prev(n)
  }

  /** Naive reference for the property tests: full O(n·m) table, the
    * textbook recurrence, independently written (no row trick, no
    * shared code path with the two-row kernel).
    */
  def naiveLcs(ref: Seq[String], toks: Seq[String]): Int = {
    val m = ref.size; val n = toks.size
    val dp = Array.ofDim[Int](m + 1, n + 1)
    for (j <- 1 to m; i <- 1 to n) {
      dp(j)(i) = math.max(
        math.max(dp(j - 1)(i), dp(j)(i - 1)),
        dp(j - 1)(i - 1) + (if (ref(j - 1) == toks(i - 1)) 1 else 0))
    }
    dp(m)(n)
  }
}

/** Token-level Smith–Waterman LOCAL alignment score against a fixed
  * reference (Smith & Waterman 1981, public) — the quote/plagiarism
  * detector [[LcsTokens]] is not: LCS scores a 4-token exact quote and
  * 4 tokens scattered across a document identically, while local
  * alignment (match +2, mismatch −1, gap −1, floor 0) rewards the
  * CONTIGUOUS region — a verbatim k-token quote scores 2k, scattered
  * tokens decay through the gap penalty. The score is the max cell of
  * the DP, i.e. the best locally-aligned span anywhere in the doc.
  *
  * Same envelope as LcsTokens: reference rides the plan, O(n·m)
  * two-row DP map-side, integer score. The oracle replays it with the
  * decay-max ladder: per reference row, core = max(0, diag, up), then
  * the left-gap chain resolves to ONE running max of (core + i) − i
  * (linear gap cost ⇒ the within-row recurrence telescopes).
  */
case class SwTokens(child: Expression, ref: Seq[String])
    extends UnaryExpression {
  require(ref.nonEmpty && ref.size <= 64,
    "sw_tokens reference must be 1..64 tokens")
  require(ref.forall(_.nonEmpty), "reference tokens must be non-empty")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sw_tokens expects a string, got ${t.simpleString}")
    }

  @transient private lazy val refArr: Array[String] = ref.toArray

  override def nullSafeEval(input: Any): Any =
    SwTokens.sw(refArr, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("swRef", refArr,
      classOf[Array[String]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SwTokens$$.MODULE$$.sw($r, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SwTokens {

  /** Two-row local-alignment DP, classic weights (+2/−1/−1, floor 0). */
  def sw(ref: Array[String], text: UTF8String): Int = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var best = 0
    var j = 0
    while (j < ref.length) {
      val rj = ref(j)
      var i = 1
      while (i <= n) {
        val d = prev(i - 1) + (if (toks(i - 1) == rj) 2 else -1)
        var v = if (d > 0) d else 0
        if (prev(i) - 1 > v) v = prev(i) - 1
        if (cur(i - 1) - 1 > v) v = cur(i - 1) - 1
        cur(i) = v
        if (v > best) best = v
        i += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      j += 1
    }
    best
  }

  /** Naive reference for the property tests: full table, textbook
    * recurrence, independently written.
    */
  def naiveSw(ref: Seq[String], toks: Seq[String]): Int = {
    val m = ref.size; val n = toks.size
    val dp = Array.ofDim[Int](m + 1, n + 1)
    var best = 0
    for (j <- 1 to m; i <- 1 to n) {
      dp(j)(i) = Seq(0,
        dp(j - 1)(i - 1) + (if (ref(j - 1) == toks(i - 1)) 2 else -1),
        dp(j - 1)(i) - 1, dp(j)(i - 1) - 1).max
      best = math.max(best, dp(j)(i))
    }
    best
  }
}

object LcsFunctions {
  def lcs_tokens(text: Column, ref: Seq[String]): Column =
    ColumnBridge.column(LcsTokens(ColumnBridge.expression(text), ref))

  def sw_tokens(text: Column, ref: Seq[String]): Column =
    ColumnBridge.column(SwTokens(ColumnBridge.expression(text), ref))
}
