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

object UnigramFunctions {
  def unigram_pieces(word: Column, vocab: Seq[(String, Int)]): Column =
    ColumnBridge.column(UnigramPieces(ColumnBridge.expression(word), vocab))
}
