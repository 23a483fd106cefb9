package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native codegen'd dot product over two `array<float>` columns.
  *
  * The declarative form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * allocates an intermediate array and boxes every element through the
  * lambda interpreter; this expression reads both ArrayData buffers in a
  * primitive loop (and generates exactly that loop under WholeStageCodegen).
  * Measured ~40x faster on 64-dim vectors. Double accumulation, fixed
  * left-to-right order — deterministic for a given row, used for ranking
  * and prefiltering (the bit-stable cross-engine path stays DECIMAL, see
  * graft.operators.Similarity).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects (array<float>, array<float>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd dot product of an `array<float>` column with an
  * `array<double>` column (typically a literal hyperplane). For
  * EQUAL-length inputs the semantics are bit-identical to the declarative
  * `aggregate(zip_with(v, w, (x, wd) => x.cast(double) * wd), 0d, _+_)`
  * — float widened to double, products in double, strict left-to-right
  * accumulation — so LSH sketches computed either way are the same bits;
  * this form just skips the per-element boxing and array allocation of
  * the lambda interpreter. Lengths differing is where they part ways:
  * zip_with null-pads the shorter side (the HOF sum goes null), while
  * this expression sums over the shorter length.
  */
case class FloatDoubleVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot_fd expects (array<float>, array<double>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += (double) $a.getFloat($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd positional match count over two `array<bigint>`
  * columns: the number of indices i where a(i) == b(i) (over the shorter
  * length). This is the MinHash signature-agreement kernel — the
  * declarative `size(filter(zip_with(a, b, _ === _), identity))` form
  * allocates and boxes per pair; this is one primitive loop.
  */
case class LongVecMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_match_count expects (array<bigint>, array<bigint>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd k-token shingling over a single-space-tokenized
  * string: returns the array of `k`-grams in positional order with
  * duplicates retained; a text shorter than `k` tokens contributes
  * itself as its only shingle. For NON-NULL input, bit-identical to the
  * declarative
  * `transform(sequence(1, n-k+1), i => concat_ws(" ", element_at...))`
  * form (tokenization is the same regex-space split the SQL `split`
  * uses), but one primitive pass instead of an interpreted lambda per
  * shingle — this feeds every shingle-based dedup/decontamination
  * operator's hottest map stage. NULL text yields a NULL array (no
  * shingles after explode) — SQL-consistent (`string_split(NULL)` is
  * NULL in DuckDB too), where the old HOF form's `otherwise` branch
  * produced the quirk `[NULL]`.
  */
case class StringShingles(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles expects a string, got ${t.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    StringShingles.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StringShingles$$.MODULE$$.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringShingles {
  import org.apache.spark.unsafe.types.UTF8String

  private val Space = UTF8String.fromString(" ")

  /** One primitive pass: regex-space split (same as SQL `split`), then
    * k-gram joins over token windows.
    */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val toks = s.split(Space, -1)
    if (toks.length < k) {
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](s.clone()))
    } else {
      val n = toks.length - k + 1
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = UTF8String.concatWs(
          Space, java.util.Arrays.copyOfRange(toks, i, i + k): _*)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}

/** Unicode normalization (NFC / NFD / NFKC / NFKD) as a native
  * codegen'd expression — the corpus-canonicalization step every
  * multilingual ingest needs (decomposed accents from OCR/mac
  * filesystems, compatibility ligatures/width forms from PDFs) that
  * Spark has no built-in for. Backed by the JDK's
  * `java.text.Normalizer` (Unicode-standard behavior, so results match
  * DuckDB's `nfc_normalize` — p68's oracle). The common case — clean
  * ASCII — is detected by a byte/char-count compare on the UTF8String
  * (no decode, no allocation) and returns the input buffer untouched;
  * non-ASCII text that is already normalized pays one String decode but
  * no rebuild. The `Normalizer.Form` resolves once (per expression
  * interpreted, as a class literal under codegen), never per row.
  */
case class TextNormalize(child: Expression, form: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(TextNormalize.forms.contains(form),
    s"form must be one of ${TextNormalize.forms.keys.mkString("/")}, got $form")

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"text_normalize expects a string, got ${t.simpleString}")
    }

  @transient private lazy val resolvedForm = TextNormalize.forms(form)

  override def nullSafeEval(input: Any): Any =
    TextNormalize.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      resolvedForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextNormalize$$.MODULE$$.compute(" +
        s"$c, java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormalize {
  import org.apache.spark.unsafe.types.UTF8String

  private[functions] val forms: Map[String, java.text.Normalizer.Form] = Map(
    "NFC" -> java.text.Normalizer.Form.NFC,
    "NFD" -> java.text.Normalizer.Form.NFD,
    "NFKC" -> java.text.Normalizer.Form.NFKC,
    "NFKD" -> java.text.Normalizer.Form.NFKD)

  def compute(s: UTF8String, form: java.text.Normalizer.Form): UTF8String =
    // all-ASCII is normalized under every form; numBytes == numChars
    // detects it with one byte scan and no allocation
    if (s.numBytes == s.numChars) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, form)) s
      else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
    }
}

/** Native codegen'd Hamming distance between two strings (byte-wise):
  * the number of positions where the byte differs, plus the length
  * difference (a missing position counts as different). For the
  * equal-length bit-string hashes the dedup family emits (dHash,
  * SimHash chunks, audio contours) this is the exact bit Hamming
  * distance. The declarative form —
  * `aggregate(sequence(1, 64), 0, (acc, i) -> acc + IF(substring(a, i,
  * 1) = substring(b, i, 1), 0, 1))` — allocates a 64-element array and
  * interprets a lambda per position (HigherOrderFunction is
  * CodegenFallback); this expression is one primitive byte loop under
  * WholeStageCodegen, which matters when the candidate-pair frame is
  * billions of rows.
  */
case class StringHamming(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType == org.apache.spark.sql.types.StringType &&
      right.dataType == org.apache.spark.sql.types.StringType
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bits_hamming expects (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val nx = x.numBytes()
    val ny = y.numBytes()
    val n = math.min(nx, ny)
    var acc = math.abs(nx - ny)
    var i = 0
    while (i < n) {
      if (x.getByte(i) != y.getByte(i)) acc += 1
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numBytes(), $b.numBytes());
         |int $acc = java.lang.Math.abs($a.numBytes() - $b.numBytes());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getByte($i) != $b.getByte($i)) $acc++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SignLshSketches {
  /** Deterministic hyperplane grid (splitmix64): weight(t, p, d) =
    * floorMod(splitmix64(((t·1024 + p) << 20) + d), 2000001)/10⁶ − 1 —
    * the SAME doubles the pre-r14 typedLit planes carried (moved here
    * from graft.operators.Similarity.planeWeights), so sketches are
    * stable across the representation change.
    */
  private[graft] def weights(
      tables: Int, planes: Int, dims: Int): Array[Array[Array[Double]]] = {
    import graft.functions.Hashing.splitmix64
    Array.tabulate(tables, planes, dims) { (t, p, d) =>
      math.floorMod(splitmix64(((t * 1024L + p) << 20) + d), 2000001L) /
        1000000.0 - 1.0
    }
  }
}

/** Native batched sign-LSH sketcher: `tables` OR-amplified sketches of
  * `planes` sign bits each over the deterministic hyperplane grid of
  * [[SignLshSketches.weights]]. The weight matrix rides the expression
  * OBJECT (one plan node), not the plan tree: the declarative form this
  * replaces carried planes × tables typedLit arrays — at p173's
  * (12, 232) operating point that is ~178k literal doubles, enough to
  * OOM an 8 GB driver during planning/codegen, and interpretation-heavy
  * per row besides. Bit-identical to that form (SignLshSketchesSpec
  * rebuilds the typedLit construction and pins equality): each
  * projection is the same strict left-to-right double accumulation
  * over min(length, dims) components as [[FloatDoubleVecDot]], and the
  * per-plane decide replicates Spark's `> 0` semantics INCLUDING the
  * NaN-is-largest ordering (a NaN projection sets the bit, as
  * `when(dot > 0, ...)` did). A NULL vector sketches to all-zero bits
  * (a length-`tables` array, never null — it falls out at the cosine
  * verify stage, exactly the pre-kernel behavior); a vector LONGER
  * than dims raises with the lshSketches contract message.
  */
case class SignLshSketches(
    child: Expression, planes: Int, tables: Int, dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(planes >= 1 && planes <= 63 && tables >= 1 && dims >= 1,
    s"sign_lsh_sketches knobs out of range: planes=$planes tables=$tables")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_lsh_sketches expects array<float>, got ${t.simpleString}")
    }

  @transient private lazy val w: Array[Array[Array[Double]]] =
    SignLshSketches.weights(tables, planes, dims)

  def compute(input: ArrayData): ArrayData = {
    val out = new Array[Long](tables)
    if (input == null) return new GenericArrayData(out)
    val n = input.numElements()
    if (n > dims)
      throw new RuntimeException(
        s"lshSketches: vector length $n exceeds dims=$dims; raise dims " +
          "to cover the embedding")
    val m = if (n < dims) n else dims
    var t = 0
    while (t < tables) {
      val wt = w(t)
      var sk = 0L
      var p = 0
      while (p < planes) {
        val wp = wt(p)
        var acc = 0.0
        var i = 0
        while (i < m) {
          acc += input.getFloat(i).toDouble * wp(i)
          i += 1
        }
        // Spark's `dot > 0` orders NaN above every value: replicate
        if (acc > 0.0 || java.lang.Double.isNaN(acc)) sk |= (1L << p)
        p += 1
      }
      out(t) = sk
      t += 1
    }
    new GenericArrayData(out)
  }

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any =
    compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("signLshSketches", this,
      classOf[SignLshSketches].getName)
    val arrCls = classOf[ArrayData].getName
    ev.copy(
      code = c.code + code"""
        |$arrCls ${ev.value} =
        |  $ref.compute(${c.isNull} ? null : ${c.value});""".stripMargin,
      isNull =
        org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Column DSL + SQL registration for the native vector functions. */
object VectorFunctions {

  def sign_lsh_sketches(
      v: Column, planes: Int, tables: Int, dims: Int): Column =
    ColumnBridge.column(
      SignLshSketches(ColumnBridge.expression(v), planes, tables, dims))

  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vec_match_count(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongVecMatchCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vec_dot_fd(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatDoubleVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def text_shingles(text: Column, k: Int): Column =
    ColumnBridge.column(StringShingles(ColumnBridge.expression(text), k))

  def text_normalize(text: Column, form: String = "NFC"): Column =
    ColumnBridge.column(TextNormalize(ColumnBridge.expression(text), form))

  def bits_hamming(a: Column, b: Column): Column =
    ColumnBridge.column(
      StringHamming(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cosine from the native dot (double path — for ranking/prefilter). */
  def vec_cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    vec_dot(a, b) / (sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b)))
  }

  private val vecDotEntry = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"vec_dot expects 2 arguments (array<float>, array<float>), " +
          s"got ${children.length}")
      FloatVecDot(children(0), children(1)): Expression
    })

  private val vecMatchCountEntry = (
    FunctionIdentifier("vec_match_count"),
    new ExpressionInfo(classOf[LongVecMatchCount].getName, "vec_match_count"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"vec_match_count expects 2 arguments (array<bigint>, array<bigint>), " +
          s"got ${children.length}")
      LongVecMatchCount(children(0), children(1)): Expression
    })

  /** SparkSessionExtensions hook for new sessions:
    * `SparkSession.builder().withExtensions(new GraftExtensions)`.
    */
  private val bitsHammingEntry = (
    FunctionIdentifier("bits_hamming"),
    new ExpressionInfo(classOf[StringHamming].getName, "bits_hamming"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"bits_hamming expects 2 arguments (string, string), " +
          s"got ${children.length}")
      StringHamming(children(0), children(1)): Expression
    })

  private val gearChunksEntry = (
    FunctionIdentifier("gear_chunks"),
    new ExpressionInfo(classOf[GearChunks].getName, "gear_chunks"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"gear_chunks expects 2 arguments (string, maskBits literal), " +
          s"got ${children.length}")
      val bits = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"gear_chunks maskBits must be an integer literal, got $other")
      }
      GearChunks(children(0), bits): Expression
    })

  class GraftExtensions extends (SparkSessionExtensions => Unit) {
    override def apply(e: SparkSessionExtensions): Unit = {
      e.injectFunction(vecDotEntry)
      e.injectFunction(vecMatchCountEntry)
      e.injectFunction(bitsHammingEntry)
      e.injectFunction(gearChunksEntry)
    }
  }

  /** Register on an already-running session (getOrCreate ignores
    * withExtensions when a session exists).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      vecDotEntry._1, vecDotEntry._2, vecDotEntry._3)
    spark.sessionState.functionRegistry.registerFunction(
      vecMatchCountEntry._1, vecMatchCountEntry._2, vecMatchCountEntry._3)
    spark.sessionState.functionRegistry.registerFunction(
      bitsHammingEntry._1, bitsHammingEntry._2, bitsHammingEntry._3)
    spark.sessionState.functionRegistry.registerFunction(
      gearChunksEntry._1, gearChunksEntry._2, gearChunksEntry._3)
  }
}
