package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern dictionary matching (Aho–Corasick, public classic) as a
  * native codegen'd expression: find EVERY occurrence of EVERY term of a
  * fixed dictionary in one left-to-right pass over the text — the
  * blocklist/content-filter scan of a training-data pipeline
  * (license-tainted phrases, unsafe-content markers, eval-set canaries).
  *
  * Why an automaton and not `locate`/regex alternation: a per-term scan
  * is O(terms x chars) and a regex alternation backtracks; the AC
  * automaton is O(chars + matches) INDEPENDENT of dictionary size, so a
  * 100k-term blocklist costs the same single pass as a 10-term one. The
  * automaton is built once per executor from the broadcast-style term
  * list carried by the expression (plan-embedded literals; dictionary
  * size bounded by plan-transport, the same envelope as a broadcast
  * join's small side) and matching stays inside whole-stage codegen via
  * a reference object, the same pattern Spark's own regexp expressions
  * use for their compiled Pattern.
  *
  * Exact semantics (the DuckDB oracle replays them positionally):
  *  - characters are UTF-16 units (Java semantics; identical to code
  *    points on BMP text — the GearChunks/p42 charset precedent),
  *  - ALL occurrences are reported, overlapping and nested included
  *    ("park" inside "spark" fires both; "aa" in "aaa" fires twice),
  *  - a match is (tid, pos): 0-based term index, 1-based start offset,
  *  - output order is (end position asc, tid asc) — deterministic.
  */
case class MultiMatch(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "multi_match needs at least one term")
  require(terms.forall(_.nonEmpty), "multi_match terms must be non-empty")
  require(terms.distinct.size == terms.size,
    "multi_match terms must be distinct (tid would be ambiguous)")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tid", IntegerType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"multi_match expects a string, got ${t.simpleString}")
    }

  @transient private lazy val automaton = AhoCorasick.build(terms)

  override def nullSafeEval(input: Any): Any =
    AhoCorasick.findAll(automaton, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the built automaton rides the references array (one instance per
    // plan, shared by every row the generated code sees) — matching
    // stays inside the whole-stage codegen span
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AhoCorasick$$.MODULE$$.findAll($acRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Immutable matching tables for one dictionary: per-state goto maps, the
  * BFS-built failure links, and per-state term-id output lists (own term
  * first, then everything inherited along the failure chain, kept
  * tid-sorted for the documented deterministic emission order).
  *
  * The hot path reads `ascii` — a dense per-state transition array for
  * chars < 128 (-1 = absent), sized states x 128 ints, i.e. bounded by
  * total dictionary characters, never the corpus — with the boxed map
  * as the non-ASCII fallback only. Measured 28 -> 102 MB/s on the
  * GB-scale smoke corpus (8 terms, 253 MB).
  */
final class AhoCorasick(
    val goto: Array[Map[Char, Int]],
    val fail: Array[Int],
    val out: Array[Array[Int]],
    val termLen: Array[Int]) extends Serializable {
  @transient lazy val ascii: Array[Array[Int]] = goto.map { m =>
    val a = Array.fill(128)(-1)
    m.foreach { case (c, s) => if (c < 128) a(c.toInt) = s }
    a
  }
}

object AhoCorasick {

  def build(terms: Seq[String]): AhoCorasick = {
    val goto = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val own = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
    // trie of the terms
    terms.zipWithIndex.foreach { case (term, tid) =>
      var s = 0
      term.foreach { c =>
        s = goto(s).getOrElseUpdate(c, {
          goto += scala.collection.mutable.Map.empty[Char, Int]
          own += Nil
          goto.size - 1
        })
      }
      own(s) = tid :: own(s)
    }
    val n = goto.size
    val fail = new Array[Int](n)
    val out = new Array[List[Int]](n)
    var i = 0
    while (i < n) { out(i) = own(i); i += 1 }
    // BFS: fail(child of s via c) = deepest proper suffix state with a
    // c-transition; outputs accumulate along the failure chain
    val queue = scala.collection.mutable.Queue[Int]()
    goto(0).valuesIterator.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = out(s) ::: out(fail(s))
      goto(s).foreach { case (c, child) =>
        var f = fail(s)
        while (f != 0 && !goto(f).contains(c)) f = fail(f)
        fail(child) = goto(f).getOrElse(c, 0) match {
          case `child` => 0 // c-edge from root IS this child
          case other   => other
        }
        queue += child
      }
    }
    new AhoCorasick(
      goto.map(_.toMap).toArray, fail,
      out.map(_.sorted.toArray), terms.map(_.length).toArray)
  }

  /** One pass; returns array<struct<tid int, pos int>> with 1-based
    * match-start positions, ordered (end asc, tid asc).
    */
  def findAll(ac: AhoCorasick, text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    val ascii = ac.ascii
    val fail = ac.fail
    val hits = new scala.collection.mutable.ArrayBuffer[Any]()
    var state = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c < 128) {
        while (state != 0 && ascii(state)(c.toInt) < 0) state = fail(state)
        val nxt = ascii(state)(c.toInt)
        state = if (nxt < 0) 0 else nxt
      } else {
        while (state != 0 && !ac.goto(state).contains(c)) state = fail(state)
        state = ac.goto(state).getOrElse(c, 0)
      }
      val outs = ac.out(state)
      var j = 0
      while (j < outs.length) {
        val tid = outs(j)
        hits += new GenericInternalRow(
          Array[Any](tid, i - ac.termLen(tid) + 2))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(hits.toArray)
  }

  /** Naive O(terms x chars) reference for the property tests. */
  def naiveFindAll(terms: Seq[String], s: String): Seq[(Int, Int)] =
    for {
      end <- 1 to s.length
      (term, tid) <- terms.zipWithIndex
      start = end - term.length
      if start >= 0 && s.regionMatches(start, term, 0, term.length)
    } yield (tid, start + 1)
}

/** Greedy longest-match subword tokenization (the WordPiece scheme of
  * the BERT family — Wu et al. 2016, public; the MaxMatch algorithm):
  * encode one WORD against a fixed vocabulary of start pieces and
  * "##"-prefixed continuation pieces by repeatedly taking the LONGEST
  * vocabulary piece matching at the cursor; if no piece matches at any
  * cursor position the WHOLE word encodes as ["[UNK]"]. The greedy
  * longest-match rule is what distinguishes this from BPE (p42/p102
  * replay learned merges in order; this never consults merge history —
  * complementary tokenizer families, both used by corpus pipelines to
  * budget and pack tokens).
  *
  * Lookup is by (continuation?, length) keyed sets, longest length
  * first — O(chars x maxPieceLen) per word with maxPieceLen a small
  * vocabulary constant. The intended call shape is over the DISTINCT
  * word dictionary (encode each word once, join counts back), so the
  * per-word constant is off the corpus-sized hot path entirely.
  *
  * Semantics pinned for the oracle replay (exact, no tie ambiguity:
  * two distinct pieces of equal effective length matching at one
  * cursor would be the same string):
  *  - characters are UTF-16 units (the GearChunks/p42 precedent),
  *  - position 0 consults only non-## pieces, positions > 0 only
  *    ## pieces (strictly: their effective text after the marker),
  *  - on failure the result is exactly ["[UNK]"] regardless of any
  *    pieces already consumed.
  */
case class WordPieces(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  require(vocab.nonEmpty, "wordpieces needs a vocabulary")
  require(vocab.distinct.size == vocab.size, "vocabulary must be distinct")
  require(vocab.forall(p => p != "##" && p.nonEmpty),
    "pieces must have non-empty effective text")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wordpieces expects a string, got ${t.simpleString}")
    }

  @transient private lazy val table = WordPieceTable.build(vocab)

  override def nullSafeEval(input: Any): Any =
    WordPieceTable.encode(table, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpTable", table,
      classOf[WordPieceTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordPieceTable$$.MODULE$$.encode($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Length-keyed piece sets: `start(l)` / `cont(l)` hold the effective
  * texts of length l (continuation pieces stripped of their marker).
  */
final class WordPieceTable(
    val start: Map[Int, Set[String]],
    val cont: Map[Int, Set[String]],
    val maxLen: Int) extends Serializable

object WordPieceTable {
  val Unk = "[UNK]"

  def build(vocab: Seq[String]): WordPieceTable = {
    val (contPieces, startPieces) = vocab.partition(_.startsWith("##"))
    val start = startPieces.groupBy(_.length)
      .map { case (l, ps) => l -> ps.toSet }
    val cont = contPieces.map(_.substring(2)).groupBy(_.length)
      .map { case (l, ps) => l -> ps.toSet }
    val maxLen = ((start.keySet ++ cont.keySet) + 0).max
    new WordPieceTable(start, cont, maxLen)
  }

  def encode(t: WordPieceTable, word: UTF8String): ArrayData = {
    val s = word.toString
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var pos = 0
    while (pos < n) {
      val sets = if (pos == 0) t.start else t.cont
      var l = math.min(t.maxLen, n - pos)
      var hit = -1
      while (l >= 1 && hit < 0) {
        if (sets.get(l).exists(_.contains(s.substring(pos, pos + l)))) hit = l
        else l -= 1
      }
      if (hit < 0)
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array[Any](UTF8String.fromString(Unk)))
      out += UTF8String.fromString(
        (if (pos == 0) "" else "##") + s.substring(pos, pos + hit))
      pos += hit
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Naive reference for the property tests: same semantics, no
    * length-keyed lookup (scan the whole vocabulary at each cursor).
    */
  def naiveEncode(vocab: Seq[String], word: String): Seq[String] = {
    var pos = 0
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (pos < word.length) {
      val cands = vocab
        .filter(p => p.startsWith("##") == (pos > 0))
        .map(p => (p, if (pos > 0) p.substring(2) else p))
        .filter { case (_, eff) =>
          eff.nonEmpty && word.regionMatches(pos, eff, 0, eff.length) }
      if (cands.isEmpty) return Seq(Unk)
      val (piece, eff) = cands.maxBy(_._2.length)
      out += piece
      pos += eff.length
    }
    out.toSeq
  }
}

object MatchFunctions {
  def multi_match(text: Column, terms: Seq[String]): Column =
    ColumnBridge.column(MultiMatch(ColumnBridge.expression(text), terms))

  def wordpieces(word: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(WordPieces(ColumnBridge.expression(word), vocab))
}
