package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType, FloatType}

/** Native kernel for [[graft.operators.KMeansOp]]'s exact-INTEGER
  * cluster energies E_c = sum_d (n_c x_d9 - S_cd9)^2 over
  * quantE9-quantized elements (x9 = floor(double(x)·1e9), the
  * dec_cosine_e6 quantization; S is the per-cluster per-dim sum of
  * x9) — the per-row hot path of assignment, and therefore of every
  * Lloyd round. Output units are e18 (value² × 10¹⁸).
  *
  * Round-13 rework: the previous kernel reproduced the declarative
  * DECIMAL(18,9) cast ladder rounding point for rounding point — but
  * `CAST(float AS DECIMAL(18,9))` is itself not engine-portable
  * (DuckDB rounds the float's shortest ~9-digit repr where Spark
  * rounds the exact double — the documented dec_cosine_e6 finding),
  * so the energies differed ~1e-8 between the entry and its oracle
  * and a pathological near-tie assignment could in principle flip.
  * Integer e9 energies are BIT-IDENTICAL across engines: the
  * quantization is the one IEEE multiply both evaluate identically
  * with tie-free floor, and everything after is exact integer
  * arithmetic (BigInteger here, HUGEINT in the SQL replay). The
  * argmin ratio E_c/n_c² is then ONE double division of identical
  * integers — deterministic on both engines even at an exact tie.
  *
  * One primitive loop per row computes all k energies (the
  * declarative aggregate(zip_with) chain runs on Catalyst's
  * HigherOrderFunction INTERPRETER and dominated every Lloyd round).
  * NULL semantics: a ragged vector, a null/NaN/infinite element, or
  * an element with |x·1e9| past Long range nulls EVERY cluster's
  * energy (the same elements feed all k sums; the Long-range null
  * matches dec_cosine_e6's out-of-spec stance — DuckDB's BIGINT cast
  * would raise where .toLong would silently saturate). A per-cluster
  * energy past DECIMAL(38,0) nulls that cluster (out of the
  * documented n·|x| bound — see KMeansOp). KMeansEnergiesSpec pins
  * equality against the declarative integer form on fixture and
  * adversarial inputs; the DuckDB oracles for p47/p99/p107/p161
  * re-verify it end-to-end every round.
  */
case class KMeansEnergies(
    child: Expression,
    sums: Seq[Seq[Long]],
    counts: Seq[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import java.math.{BigInteger => KJBI}
  require(sums.nonEmpty && sums.length == counts.length,
    "model shape: one (sums, count) pair per cluster")
  require(sums.forall(_.length == sums.head.length),
    "all centroid sum vectors must share one dimensionality")

  override def dataType: DataType =
    ArrayType(DecimalType(38, 0), containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmeans_energies expects array<float>, got ${t.simpleString}")
    }

  @transient private lazy val sJbi: Array[Array[KJBI]] =
    sums.map(_.map(KJBI.valueOf).toArray).toArray
  @transient private lazy val nJbi: Array[KJBI] =
    counts.map(KJBI.valueOf).toArray

  def compute(input: ArrayData): ArrayData = {
    val k = sJbi.length
    val dims = sJbi(0).length
    val n = input.numElements()
    var broken = n != dims
    var i = 0
    while (!broken && i < n) {
      if (input.isNullAt(i)) broken = true
      i += 1
    }
    if (broken) return new GenericArrayData(new Array[Any](k))
    // quantize each element ONCE — identical for every cluster
    val xs = new Array[KJBI](dims)
    i = 0
    while (i < dims) {
      val f = input.getFloat(i).toDouble
      if (java.lang.Double.isNaN(f) || java.lang.Double.isInfinite(f))
        return new GenericArrayData(new Array[Any](k))
      val q = math.floor(f * 1e9)
      // same Long-range null band as DecVecCosineE6 (2^63 exactly as
      // a double; -2^63 itself is a valid Long)
      if (q >= 9.223372036854776e18 || q < -9.223372036854776e18)
        return new GenericArrayData(new Array[Any](k))
      xs(i) = KJBI.valueOf(q.toLong)
      i += 1
    }
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      val s = sJbi(c)
      val nc = nJbi(c)
      var acc = KJBI.ZERO
      var d = 0
      while (d < dims) {
        val diff = nc.multiply(xs(d)).subtract(s(d))
        acc = acc.add(diff.multiply(diff))
        d += 1
      }
      // exact BigInteger energy → DECIMAL(38,0); past 1e38 the cast
      // fails and that cluster nulls. NOTE the (1e38, 1.7e38) band:
      // HUGEINT holds to ~1.7e38, so in that band DuckDB would still
      // rank the cluster in its argmin while Spark excludes it — the
      // band sits INSIDE the out-of-contract region and the engines'
      // agreement there rests on the documented n·A operating bound
      // keeping energies far below 1e38, not on the oracle erroring
      val dec = Decimal(scala.math.BigDecimal(new java.math.BigDecimal(acc)))
      out(c) = if (dec.changePrecision(38, 0)) dec else null
      c += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kmeansEnergies", this,
      classOf[KMeansEnergies].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native kernel for the EXACT decimal cosine
  * `dotExact(dec(a), dec(b)) / (normExact(dec(a)) * normExact(dec(b)))`
  * — the decide kernel of every two-kernel similarity operator and the
  * per-round rescore of MMR, previously three interpreted
  * aggregate(zip_with) chains per pair.
  *
  * Bit-identical to the declarative chain (DecCosineSpec pins it):
  * each float widens via Spark's own `Decimal(double)` cast to (18,9);
  * products are (18,9)x(18,9) -> exact (37,18) -> (38,18); every merge
  * add rounds at (38,17) then re-casts to (38,18) (the same
  * precision-loss point [[KMeansEnergies]] documents); the three sums
  * cast to double and combine in the IEEE order dot / (sqrt(na) *
  * sqrt(nb)). NULL mirrors zip_with: a length mismatch or a null
  * element on either side nulls the result. ONE deliberate divergence:
  * a ZERO norm returns NULL (cosine undefined) where the declarative
  * chain raised DIVIDE_BY_ZERO under ANSI — every call site already
  * filters sim IS NOT NULL, so zero-norm rows now drop uniformly with
  * null-embedding rows instead of crashing the query (and a NaN would
  * have been worse: it sorts FIRST under a descending rank). Decimal
  * zero-norm implies zero dot (a sub-1e-9 float casts to decimal zero
  * everywhere), so no finite cosine is ever lost.
  */
case class DecVecCosine(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true

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
        s"dec_cosine expects (array<float>, array<float>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    val xa = new Array[Decimal](n)
    val xb = new Array[Decimal](n)
    i = 0
    while (i < n) {
      val da = Decimal(a.getFloat(i).toDouble)
      val db = Decimal(b.getFloat(i).toDouble)
      if (!da.changePrecision(18, 9) || !db.changePrecision(18, 9))
        return null
      xa(i) = da; xb(i) = db
      i += 1
    }
    // one merge chain per sum, the declarative (38,17)->(38,18) ladder
    def accumulate(f: Int => Decimal): Option[Decimal] = {
      var acc = Decimal(0)
      acc.changePrecision(38, 18)
      var d = 0
      while (d < n) {
        val term = f(d)
        if (!term.changePrecision(38, 18)) return None
        acc = acc + term
        if (!acc.changePrecision(38, 17)) return None
        if (!acc.changePrecision(38, 18)) return None
        d += 1
      }
      Some(acc)
    }
    (for {
      dot <- accumulate(d => xa(d) * xb(d))
      na <- accumulate(d => xa(d) * xa(d))
      nb <- accumulate(d => xb(d) * xb(d))
      if na.toDouble != 0.0 && nb.toDouble != 0.0 // undefined -> NULL
    } yield dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
      .orNull
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("decCosine", this,
      classOf[DecVecCosine].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("res")
      s"""
         |Object $res = $ref.compute($a, $b);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((Double) $res).doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** EXACT micro-cosine `floor(1e6 * cos(a, b))` as a LONG — the
  * scale-exact replacement for `floor(dec_cosine(a, b) * 1e6)`.
  *
  * Why the double form is not scale-exact — TWO cross-engine gaps,
  * both observed at sf0.1 (6/920 p12 rows, 3/1025 p109 rows — the
  * round-11 exclusion list this kernel empties):
  *  - ELEMENT QUANTIZATION: `CAST(float AS DECIMAL(18,9))` is not the
  *    same value on both engines. Spark rounds the float's exact
  *    double value; DuckDB goes through the float's SHORTEST decimal
  *    repr (~9 significant digits), so per-element decimals differ by
  *    up to 1e-9 and 64-dim sums by ~1e-8 — masked by a 1e-6 render
  *    except within ~1e-8 of a boundary (measured: 95598/128000
  *    fixture elements differ). Even `CAST(CAST(x AS DOUBLE) AS
  *    DECIMAL)` differs on ties (DuckDB half-even vs Spark HALF_UP).
  *  - SUM/CAST ulp: the decimal sums cast to DOUBLE lose below the
  *    53rd bit, one more last-ulp coin flip.
  *
  * The portable pipeline — every step either pure integer arithmetic
  * or a SINGLE tie-free function of an IEEE double both engines
  * compute bit-identically:
  *  1. each element quantizes as xe9 = floor(double(x) * 1e9) — the
  *     multiply is the same IEEE op on the same double everywhere, and
  *     floor has no tie mode (unlike round: half-up vs half-even);
  *  2. dot18/nx18/ny18 = exact integer sums of xe9*ye9 products
  *     (e18 units; BigInteger here, HUGEINT in the SQL replay);
  *  3. each sum floor-divides by 1e9 back to e9 units (X, N, M) —
  *     exact integer division, so the ladder's squares stay under
  *     ~1e33 for unit-scale embeddings (inside HUGEINT);
  *  4. the result is floor(1e6 * X / sqrt(N*M)), computed exactly via
  *     the identity floor(A/sqrt(B)) = isqrt(floor(A^2/B)) for A >= 0
  *     (and -ceil for A < 0, with the perfect-square test deciding the
  *     ceil increment) — BigInteger, no precision cap. The SQL replay
  *     has no isqrt: it takes a double floor GUESS g (error << 1 unit)
  *     and fixes it up with the sign-aware squared comparison
  *     k <= 1e6*X/sqrt(N*M)  <=>  k^2*N*M <= 1e12*X^2 (k,X >= 0) —
  *     [[graft.queries.Pipeline.exactC6Ctes]] emits it.
  *
  * NULL mirrors [[DecVecCosine]]: length mismatch, a null element, or
  * a non-finite element nulls the result; a norm that quantizes to
  * ZERO (all |components| < 1e-9 quantized) also nulls (cosine
  * undefined — that band is quantization noise). Note floor's one
  * asymmetry: a component in (-1e-9, 0) quantizes to -1e-9, not 0, so
  * an all-negative-epsilon vector has a nonzero quantized norm.
  */
case class DecVecCosineE6(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import java.math.{BigInteger => JBI}

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

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
        s"dec_cosine_e6 expects (array<float>, array<float>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private val E6 = JBI.valueOf(1000000L)
  private val E9 = JBI.valueOf(1000000000L)

  /** floor division by 1e9 (floor, not truncation — matches the SQL
    * replay's `CASE WHEN v >= 0 THEN v // 1e9 ELSE -((-v + 1e9-1) //
    * 1e9) END` with nonnegative `//` operands only).
    */
  private def floorDivE9(v: JBI): JBI = {
    val Array(q, r) = v.divideAndRemainder(E9)
    if (v.signum() < 0 && r.signum() != 0) q.subtract(JBI.ONE) else q
  }

  def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    // element quantization + exact integer sums: products fit a Long
    // (|xe9| <= ~2^45 for |x| <= 3e4), but the 64-term sums may not at
    // extreme magnitudes — accumulate the sums in BigInteger via
    // per-element exact longs
    var dot = JBI.ZERO
    var na = JBI.ZERO
    var nb = JBI.ZERO
    i = 0
    while (i < n) {
      val fa = a.getFloat(i).toDouble
      val fb = b.getFloat(i).toDouble
      if (java.lang.Double.isNaN(fa) || java.lang.Double.isInfinite(fa) ||
          java.lang.Double.isNaN(fb) || java.lang.Double.isInfinite(fb))
        return null
      val qa = math.floor(fa * 1e9)
      val qb = math.floor(fb * 1e9)
      // |x·1e9| past Long range: .toLong would SATURATE silently
      // (wrong cosine on Spark) while the DuckDB replay's
      // CAST(... AS BIGINT) raises — null the result instead so both
      // engines agree on out-of-spec magnitudes (9.223372036854776E18
      // is exactly 2⁶³ as a double; floor values strictly below it
      // convert exactly, and -2⁶³ itself is a valid Long)
      if (qa >= 9.223372036854776e18 || qa < -9.223372036854776e18 ||
          qb >= 9.223372036854776e18 || qb < -9.223372036854776e18)
        return null
      val xa = JBI.valueOf(qa.toLong)
      val xb = JBI.valueOf(qb.toLong)
      dot = dot.add(xa.multiply(xb))
      na = na.add(xa.multiply(xa))
      nb = nb.add(xb.multiply(xb))
      i += 1
    }
    val x = floorDivE9(dot)
    val nq = floorDivE9(na) // nonnegative: floor == plain divide
    val mq = floorDivE9(nb)
    if (nq.signum() == 0 || mq.signum() == 0) return null
    val bb = nq.multiply(mq)
    val aa = x.multiply(E6)
    val a2 = aa.multiply(aa)
    val m = a2.divide(bb).sqrt()
    val k =
      if (x.signum() >= 0) m
      else if (a2 == m.multiply(m).multiply(bb)) m.negate()
      else m.add(JBI.ONE).negate()
    java.lang.Long.valueOf(k.longValueExact())
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("decCosineE6", this,
      classOf[DecVecCosineE6].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("res")
      s"""
         |Object $res = $ref.compute($a, $b);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((Long) $res).longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object KMeansFunctions {
  def kmeans_energies(
      vec: Column,
      sums: Seq[Seq[Long]], // per-cluster per-dim e9 integer sums
      counts: Seq[Long]): Column =
    ColumnBridge.column(
      KMeansEnergies(ColumnBridge.expression(vec), sums, counts))

  def dec_cosine(a: Column, b: Column): Column =
    ColumnBridge.column(
      DecVecCosine(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dec_cosine_e6(a: Column, b: Column): Column =
    ColumnBridge.column(
      DecVecCosineE6(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
