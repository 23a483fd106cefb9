package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM subword tokenization (the SentencePiece scheme — Kudo
  * 2018, public): Viterbi BEST segmentation of a word over a SCORED
  * piece vocabulary, completing the three-family tokenizer set next to
  * BPE (p42/p102, ordered merge replay) and WordPiece (p114, greedy
  * MaxMatch). Where WordPiece commits to the longest piece at each
  * cursor and can strand itself, unigram-LM searches ALL segmentations
  * and returns the global optimum — the property the divergence spec
  * pins ("data" with {da,ta,dat,a}: greedy pays dat+a, Viterbi finds
  * da+ta).
  *
  * Exactness discipline: scores are INTEGER COSTS (scaled negative
  * log-probs; minimize the sum) so the optimum is an integer compare —
  * no float ordering to diverge between engines. Tie-break is total —
  * among equal-cost segmentations, take the LONGEST piece at each
  * cursor, walking left to right (equal-length matches at one cursor
  * are the same string, so longest-first is unambiguous). The DuckDB
  * oracle replays exactly this: a chained backward DP over positions
  * (min cost to reach the word end), then a jump table ranked by
  * (total cost, length DESC), then the p114-style RECURSIVE CTE walk.
  *
  * Semantics, pinned for the oracle:
  *  - characters are UTF-16 units (the GearChunks/p42/p114 precedent),
  *  - best(n) = 0; best(i) = min over vocab pieces p matching at i of
  *    cost(p) + best(i + len(p)); unreachable best(0) => the word
  *    encodes as exactly ["[UNK]"] wholesale (the p114 convention —
  *    real SentencePiece byte-falls-back, which needs no engine
  *    machinery beyond adding byte pieces to the vocabulary),
  *  - the walk at cursor i takes the longest p with
  *    cost(p) + best(i + len(p)) == best(i),
  *  - the empty word encodes to no pieces.
  *
  * Scale shape: the intended call site is the DISTINCT word dictionary
  * (encode each word once, join corpus counts back) — the O(chars x
  * maxPieceLen) DP never runs on the corpus-sized frame. The
  * vocabulary rides the plan like [[WordPieces]]' (plan-transport
  * envelope, same as a broadcast join's small side) and the table
  * builds once per executor.
  */
case class UnigramPieces(child: Expression, vocab: Seq[(String, Int)])
    extends UnaryExpression {
  require(vocab.nonEmpty, "unigram_pieces needs a vocabulary")
  require(vocab.map(_._1).distinct.size == vocab.size,
    "vocabulary pieces must be distinct")
  require(vocab.forall(_._1.nonEmpty), "pieces must be non-empty")
  require(vocab.forall(p => p._2 > 0 && p._2 <= 1000000),
    "piece costs must be positive scaled integers (<= 10^6)")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unigram_pieces expects a string, got ${t.simpleString}")
    }

  @transient private lazy val table = UnigramTable.build(vocab)

  override def nullSafeEval(input: Any): Any =
    UnigramTable.encode(table, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugTable", table,
      classOf[UnigramTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramTable$$.MODULE$$.encode($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Length-INDEXED piece costs: `byLen(l)` is a java.util.HashMap from
  * piece text of length l to its boxed cost (null-absent — one probe,
  * no Option boxing), or null when no piece has length l. The batch
  * call sites encode only the distinct-word dictionary, but the
  * streaming fertility monitor (TokenStreams) runs this per word
  * INSTANCE map-side, so the per-cursor probe is the hot path there.
  */
final class UnigramTable(
    val byLen: Array[java.util.HashMap[String, Integer]],
    val maxLen: Int) extends Serializable

object UnigramTable {
  val Unk = "[UNK]"
  private val Inf = Long.MaxValue / 4

  def build(vocab: Seq[(String, Int)]): UnigramTable = {
    val maxLen = vocab.map(_._1.length).max
    val byLen = new Array[java.util.HashMap[String, Integer]](maxLen + 1)
    vocab.foreach { case (p, c) =>
      if (byLen(p.length) == null)
        byLen(p.length) = new java.util.HashMap[String, Integer]()
      byLen(p.length).put(p, c)
    }
    new UnigramTable(byLen, maxLen)
  }

  private def costAt(t: UnigramTable, s: String, pos: Int, l: Int): Long = {
    val m = t.byLen(l)
    if (m == null) Inf
    else {
      val c = m.get(s.substring(pos, pos + l))
      if (c == null) Inf else c.longValue()
    }
  }

  def encode(t: UnigramTable, word: UTF8String): ArrayData = {
    val s = word.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // backward DP: best(i) = min cost of segmenting s[i..n)
    val best = Array.fill(n + 1)(Inf)
    best(n) = 0L
    var pos = n - 1
    while (pos >= 0) {
      var l = math.min(t.maxLen, n - pos)
      var b = Inf
      while (l >= 1) {
        if (best(pos + l) < Inf) {
          val c = costAt(t, s, pos, l)
          if (c < Inf && c + best(pos + l) < b) b = c + best(pos + l)
        }
        l -= 1
      }
      best(pos) = b
      pos -= 1
    }
    if (best(0) >= Inf)
      return new GenericArrayData(Array[Any](UTF8String.fromString(Unk)))
    // forward walk: longest piece achieving the optimum at each cursor
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    pos = 0
    while (pos < n) {
      var l = math.min(t.maxLen, n - pos)
      var hit = -1
      while (l >= 1 && hit < 0) {
        if (best(pos + l) < Inf) {
          val c = costAt(t, s, pos, l)
          if (c < Inf && c + best(pos + l) == best(pos)) hit = l
        }
        l -= 1
      }
      // best(0) reachable implies a consistent edge at every reached
      // cursor — hit >= 1 by DP construction
      out += UTF8String.fromString(s.substring(pos, pos + hit))
      pos += hit
    }
    new GenericArrayData(out.toArray)
  }

  /** Naive reference for the property tests: enumerate EVERY
    * segmentation, pick by (total cost asc, then piece-length sequence
    * compared elementwise preferring LONGER first) — provably the same
    * selection as the DP walk's longest-among-optimal rule, derived
    * independently (exponential search, no shared code path).
    */
  def naiveEncode(vocab: Seq[(String, Int)], word: String): Seq[String] = {
    val cost = vocab.toMap
    def segs(s: String): Seq[List[String]] =
      if (s.isEmpty) Seq(Nil)
      else (1 to s.length).flatMap { l =>
        val p = s.substring(0, l)
        if (cost.contains(p)) segs(s.substring(l)).map(p :: _) else Nil
      }
    if (word.isEmpty) return Nil
    val all = segs(word)
    if (all.isEmpty) return Seq(Unk)
    // (cost, lengths preferring longer-first): two distinct length
    // sequences summing to the same total differ before either ends
    all.minBy(seg => (seg.map(cost(_).toLong).sum,
      seg.map(p => -p.length).toIndexedSeq))(
      Ordering.Tuple2(Ordering.Long, Ordering.Implicits.seqOrdering[IndexedSeq, Int]))
  }
}

/** E-step companion to [[UnigramPieces]] — EXPECTED piece counts of a
  * word under the quantized unigram measure, the quantity one round of
  * SentencePiece's EM re-estimation (Kudo 2018, public) needs where
  * Viterbi gives only the 1-best segmentation's counts.
  *
  * Model, pinned for the oracle: P(seg) ∝ Π_p V_p over the
  * caller-supplied INTEGER lattice weights V_p. The caller
  * length-homogenizes real piece probabilities into these weights
  * (V_p = W_p · B^(len_p − 1) for per-piece probability W_p/B): then
  * Π_seg V_p = B^(n−k) · Π W_p with n the word length and k the piece
  * count, i.e. a constant B^n per word times Π (W_p/B) — the lattice
  * measure IS the product-of-probabilities measure, and the scale B
  * cancels in every expectation. This keeps the entire
  * forward–backward EXACT-INTEGER: no float sum ever happens, unlike
  * a log-space forward–backward which would need approximate
  * log-add tables.
  *
  * Output: one (piece, eppm) struct per vocabulary piece matching the
  * word, where eppm = floor(10^6 · num / Z), num = Σ_occurrences
  * A(i)·V·B(j) (the total lattice weight of segmentations through each
  * occurrence — each segmentation counted once per use of the piece),
  * Z = A(n) the word's total lattice weight. Uncoverable words (Z = 0),
  * empty words, and words longer than `lenCap` return an EMPTY array —
  * the length cap is the documented HUGEINT headroom contract of the
  * DuckDB replay (V ≤ 256^len, maxPieceLen ≤ 4 ⇒ per-word mass
  * Z ≤ 2^9 · (2^8)^10 · B-homogenization ≤ 2^89; num·10^6 ≤ 2^113 <
  * 2^127), while this side computes in BigInt and never overflows.
  *
  * Length UNIT contract: this expression counts Unicode CODE POINTS —
  * word length (the lenCap gate), piece length (the homogenization
  * bound), and lattice positions all step by code point, exactly the
  * unit a Spark `length(word)` prefilter and the DuckDB ladder's
  * `length()`/`substr()` count. This deliberately departs from the
  * matcher/Viterbi family's UTF-16 convention ([[MultiMatch]],
  * [[UnigramPieces]] — where positions are offsets INTO the string and
  * units are the natural coordinate): the E-step's oracle is a
  * length-INDEXED CTE ladder, so its length unit must be the SQL
  * engines' unit or astral text diverges cross-engine (it did, pre-r11:
  * a six-emoji word was 12 units here — gated out — but 6 characters
  * to both SQL engines). On BMP text the units coincide and nothing
  * changed; on astral text the lattice now matches the ladder, and the
  * astral fuzz suite pins it. Surrogate halves can never match: slicing
  * is at code-point boundaries, so every emitted piece is well-formed
  * UTF-16 whenever the vocabulary is.
  *
  * Scale shape: intended call site is the DISTINCT word dictionary
  * (p114/p120 discipline) — the O(n · maxLen) lattice never runs on
  * the corpus-sized frame; corpus expectations are cnt-weighted sums
  * of the per-word eppm, a partial-aggregable groupBy.
  */
case class UnigramEStep(child: Expression, weights: Seq[(String, Long)],
    lenCap: Int) extends UnaryExpression {
  require(weights.nonEmpty, "unigram_estep needs lattice weights")
  require(weights.map(_._1).distinct.size == weights.size,
    "weight pieces must be distinct")
  require(weights.forall(_._1.nonEmpty), "pieces must be non-empty")
  // Per-piece headroom, NOT a flat 2^32: the Scaladoc's HUGEINT proof
  // assumes length-homogenized weights V_p = W_p · 256^(len_p − 1) with
  // W_p ≤ 256, i.e. V_p ≤ 256^len_p — a flat 2^32 bound would admit a
  // ~2^32 weight on a 1-char piece, whose per-word lattice mass on a
  // 10-char word reaches ~2^320: exact here in BigInt but an overflow
  // error in the oracle's HUGEINT ladder, a cross-engine divergence.
  // The bound caps at 2^32 (len ≥ 4) because maxPieceLen ≤ 4 in the
  // ladder contract; all callers length-homogenize and comply. len_p
  // is in CODE POINTS (the expression's length unit — see the
  // Scaladoc's unit contract).
  require(weights.forall { p =>
    val cps = p._1.codePointCount(0, p._1.length)
    p._2 >= 1L && p._2 <= (1L << (8 * math.min(cps, 4)))
  },
    "lattice weights must be length-homogenized: 1 <= V_p <= 256^min(len_p,4)" +
      " with len_p in code points (the oracle's HUGEINT headroom proof)")
  require(lenCap >= 1 && lenCap <= 10,
    "lenCap must be in [1, 10] (the oracle's ladder depth)")

  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("eppm", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unigram_estep expects a string, got ${t.simpleString}")
    }

  @transient private lazy val table = UnigramLattice.build(weights, lenCap)

  override def nullSafeEval(input: Any): Any =
    UnigramLattice.estep(table, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ugLattice", table,
      classOf[UnigramLatticeTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramLattice$$.MODULE$$.estep($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Length-indexed lattice weights (the [[UnigramTable]] layout with
  * Long weights, but keyed by CODE-POINT length — the E-step's length
  * unit, see [[UnigramEStep]]'s unit contract) plus the E-step length
  * cap.
  */
final class UnigramLatticeTable(
    val byLen: Array[java.util.HashMap[String, java.lang.Long]],
    val maxLen: Int, val lenCap: Int) extends Serializable

object UnigramLattice {
  private val Ppm = BigInt(1000000)

  def build(weights: Seq[(String, Long)], lenCap: Int): UnigramLatticeTable = {
    def cps(p: String): Int = p.codePointCount(0, p.length)
    val maxLen = weights.map(p => cps(p._1)).max
    val byLen = new Array[java.util.HashMap[String, java.lang.Long]](maxLen + 1)
    weights.foreach { case (p, v) =>
      val l = cps(p)
      if (byLen(l) == null)
        byLen(l) = new java.util.HashMap[String, java.lang.Long]()
      byLen(l).put(p, v)
    }
    new UnigramLatticeTable(byLen, maxLen, lenCap)
  }

  /** Weight of the piece spanning code points [pos, pos+l) of s, where
    * `offs` maps code-point index → UTF-16 offset. 0 when absent. */
  private def weightAt(t: UnigramLatticeTable, s: String, offs: Array[Int],
      pos: Int, l: Int): Long = {
    val m = t.byLen(l)
    if (m == null) 0L
    else {
      val v = m.get(s.substring(offs(pos), offs(pos + l)))
      if (v == null) 0L else v.longValue()
    }
  }

  def estep(t: UnigramLatticeTable, word: UTF8String): ArrayData = {
    val s = word.toString
    // every position/length below is in CODE POINTS (the SQL engines'
    // length()/substr() unit — the expression's documented contract);
    // offs(i) is the UTF-16 offset where code point i starts, so a
    // lattice edge can never slice through a surrogate pair
    val n = s.codePointCount(0, s.length)
    if (n == 0 || n > t.lenCap)
      return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](n + 1)
    var ci = 0
    var ui = 0
    while (ci < n) {
      offs(ci) = ui
      ui += Character.charCount(s.codePointAt(ui))
      ci += 1
    }
    offs(n) = s.length
    // forward: A(j) = total lattice weight of segmentations of s[0..j)
    val fwd = Array.fill(n + 1)(BigInt(0))
    fwd(0) = BigInt(1)
    var j = 1
    while (j <= n) {
      var l = math.min(t.maxLen, j)
      while (l >= 1) {
        if (fwd(j - l).signum > 0) {
          val v = weightAt(t, s, offs, j - l, l)
          if (v > 0L) fwd(j) += fwd(j - l) * v
        }
        l -= 1
      }
      j += 1
    }
    val z = fwd(n)
    if (z.signum == 0)
      return new GenericArrayData(Array.empty[Any])
    // backward: B(i) = total lattice weight of segmentations of s[i..n)
    val bwd = Array.fill(n + 1)(BigInt(0))
    bwd(n) = BigInt(1)
    var i = n - 1
    while (i >= 0) {
      var l = math.min(t.maxLen, n - i)
      while (l >= 1) {
        if (bwd(i + l).signum > 0) {
          val v = weightAt(t, s, offs, i, l)
          if (v > 0L) bwd(i) += bwd(i + l) * v
        }
        l -= 1
      }
      i -= 1
    }
    // per-piece edge mass: num(p) = Σ_occurrences A(i)·V·B(i+l); each
    // term is the weight of segmentations USING that edge, so num ≤ Z·n
    val num = new java.util.TreeMap[String, BigInt]()
    i = 0
    while (i < n) {
      if (fwd(i).signum > 0) {
        var l = math.min(t.maxLen, n - i)
        while (l >= 1) {
          if (bwd(i + l).signum > 0) {
            val v = weightAt(t, s, offs, i, l)
            if (v > 0L) {
              val p = s.substring(offs(i), offs(i + l))
              val prev = num.get(p)
              val term = fwd(i) * v * bwd(i + l)
              num.put(p, if (prev == null) term else prev + term)
            }
          }
          l -= 1
        }
      }
      i += 1
    }
    val out = new Array[Any](num.size)
    val it = num.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey),
          ((e.getValue * Ppm) / z).toLong))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Independent exhaustive reference for the property tests: enumerate
    * EVERY segmentation, weight each by the product of its piece
    * weights, and read expectations off the enumeration — no lattice,
    * no shared code path with [[estep]].
    */
  def naiveEStep(weights: Seq[(String, Long)],
      word: String): Seq[(String, Long)] = {
    val w = weights.toMap
    def segs(s: String): Seq[List[String]] =
      if (s.isEmpty) Seq(Nil)
      else (1 to s.length).flatMap { l =>
        val p = s.substring(0, l)
        if (w.contains(p)) segs(s.substring(l)).map(p :: _) else Nil
      }
    if (word.isEmpty) return Nil
    val all = segs(word)
    if (all.isEmpty) return Nil
    val weighted = all.map(seg => (seg, seg.map(p => BigInt(w(p))).product))
    val z = weighted.map(_._2).sum
    weighted
      .flatMap { case (seg, wt) => seg.map(p => (p, wt)) }
      .groupBy(_._1)
      .map { case (p, terms) =>
        p -> ((terms.map(_._2).sum * 1000000) / z).toLong }
      .toSeq.sortBy(_._1)
  }
}

/** Exact fixed-point base-2 integer logarithm — the M-step's
  * re-estimation quantizer. `ilog2f(x)` returns an integer
  * approximation of log2(x) · 2^16 computed with NOTHING but integer
  * shifts, multiplies, and compares (the classic square-and-extract
  * binary-digit algorithm), so DuckDB replays it bit-identically as a
  * 16-step CTE ladder — no float log on either engine, ever.
  *
  * Algorithm: e = floor(log2 x); mantissa m = x normalized into
  * [2^30, 2^31) by a shift (floor division — identical to the SQL
  * `//`); then 16 rounds of m ← m²/2^30, emitting fraction bit 1 and
  * halving whenever m ≥ 2^31. m < 2^31 keeps m² < 2^62 inside a
  * signed 64-bit integer on both engines. Inputs must be ≥ 1 and
  * ≤ 2^62.
  */
object IntLog {
  def ilog2f(x: Long): Long = {
    require(x >= 1L && x <= (1L << 62), s"ilog2f domain is [1, 2^62]: $x")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (e >= 30) x >> (e - 30) else x << (30 - e)
    var acc = 0L
    var k = 0
    while (k < 16) {
      m = (m * m) >> 30
      if (m >= (1L << 31)) { m >>= 1; acc = acc * 2 + 1 }
      else acc = acc * 2
      k += 1
    }
    e.toLong * 65536L + acc
  }
}

/** [[IntLog.ilog2f]] as a codegen'd column — the building block that
  * makes log-log corpus statistics (Zipf rank-frequency slope, Heaps'
  * vocabulary-growth exponent) EXACTLY replicable: both engines
  * quantize the logarithm with the same integer algorithm, so the
  * downstream least-squares sums are integer-identical. Domain is
  * [1, 2^62]; callers clamp with GREATEST(x, 1) where a zero is
  * structurally possible (the same clamp, spelled in both engines).
  */
case class Ilog2Fix(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.LongType

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ilog2_fix expects a bigint, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    IntLog.ilog2f(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IntLog$$.MODULE$$.ilog2f($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramFunctions {
  def unigram_pieces(word: Column, vocab: Seq[(String, Int)]): Column =
    ColumnBridge.column(UnigramPieces(ColumnBridge.expression(word), vocab))

  def unigram_estep(word: Column, weights: Seq[(String, Long)],
      lenCap: Int): Column =
    ColumnBridge.column(
      UnigramEStep(ColumnBridge.expression(word), weights, lenCap))

  def ilog2_fix(x: Column): Column =
    ColumnBridge.column(Ilog2Fix(ColumnBridge.expression(x)))
}
