package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Optimizer rule: rewrite pure band joins (`x BETWEEN y - a AND y + b`
  * with NO equality conjunct) from the nested-loop plan Catalyst would
  * otherwise produce into a bucket-expansion equi-join — the same shape
  * [[graft.operators.RangeJoin.bandJoin]] builds by hand, applied
  * automatically to any matching join in the plan.
  *
  * Scheme: a conjunct set bounding `x - y` in `[lo, hi]` (x from the
  * left side, y from the right, both integral) is equivalent to
  * `y IN [x - hi, x - lo]`, an interval of width `w = hi - lo + 1`.
  * Quantizing both sides by `w` puts every matching y in one of TWO
  * consecutive buckets of `x - hi`, so the left side explodes into
  * those two bucket ids, the right side computes one, and the join
  * becomes a hash-partitioned equi-join on the bucket — work scales
  * with match density instead of |L| x |R|. The ORIGINAL predicate
  * re-filters after the join, so the rewrite is exact; strict bounds
  * tighten by 1 before bucketing (integral domains only, which is also
  * what keeps the bucket arithmetic exact — no float rounding at bin
  * edges).
  *
  * Scope guards: inner joins, a two-sided integral band, no equality
  * conjunct (with one, Catalyst already plans a hash join and the
  * band is a cheap post-filter), bounds within +-2^61. NULL band keys
  * produce NULL buckets, which an inner equi-join drops — exactly the
  * rows the original predicate would drop.
  *
  * Bin arithmetic runs in DECIMAL(38,0) with bucket width >= 2, so the
  * rewrite is exact over the FULL Long domain — no ANSI overflow where
  * the original query succeeded, no wrap-around misbinning with ANSI
  * off. Exact-offset bands (hi == lo, i.e. x - y = c) skip the bucket
  * expansion and become a plain shifted equi-join.
  *
  * Register per-session via `spark.experimental.extraOptimizations
  * :+= BandJoinRewrite`, for a deployment via
  * `spark.sql.extensions=graft.plans.GraftSparkExtensions`, or apply
  * eagerly and scoped to one frame via
  * `ColumnBridge.ofRows(spark, BandJoinRewrite(df.queryExecution.analyzed))`
  * (how q49 uses it — no session-global optimizer mutation).
  */
object BandJoinRewrite extends Rule[LogicalPlan] {

  private val MaxAbsBound = 1L << 61

  private def isIntegral(t: DataType): Boolean =
    t == IntegerType || t == LongType

  private def litLong(v: Any): Long = v match {
    case i: java.lang.Integer => i.longValue
    case l: java.lang.Long => l.longValue
    case s: java.lang.Short => s.longValue
    case b: java.lang.Byte => b.longValue
  }

  private def integralLit(v: Any, t: DataType): Boolean =
    v != null && isIntegral(t)

  /** Decompose `e` as (attr + const) over an integral attribute. */
  private def linear(e: Expression): Option[(AttributeReference, Long)] = e match {
    case a: AttributeReference if isIntegral(a.dataType) => Some((a, 0L))
    case Add(a: AttributeReference, Literal(v, t), _)
        if isIntegral(a.dataType) && integralLit(v, t) => Some((a, litLong(v)))
    case Add(Literal(v, t), a: AttributeReference, _)
        if isIntegral(a.dataType) && integralLit(v, t) => Some((a, litLong(v)))
    case Subtract(a: AttributeReference, Literal(v, t), _)
        if isIntegral(a.dataType) && integralLit(v, t) => Some((a, -litLong(v)))
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** A bound on (x - y) with x from the left side, y from the right:
    * Left(lo) for `x - y >= lo`, Right(hi) for `x - y <= hi`.
    */
  private type Bound = ((ExprId, ExprId), Either[Long, Long],
    AttributeReference, AttributeReference)

  private def bound(
      c: Expression,
      leftOut: AttributeSet,
      rightOut: AttributeSet): Option[Bound] = {
    // normalize every comparison to `p <= q + adj` (adj tightens strict)
    val le: Option[(Expression, Expression, Long)] = c match {
      case LessThanOrEqual(a, b) => Some((a, b, 0L))
      case GreaterThanOrEqual(a, b) => Some((b, a, 0L))
      case LessThan(a, b) => Some((a, b, -1L))
      case GreaterThan(a, b) => Some((b, a, -1L))
      case _ => None
    }
    le.flatMap { case (p, q, adj) =>
      (linear(p), linear(q)) match {
        case (Some((px, pc)), Some((qx, qc)))
            // direct comparisons, not math.abs: abs(Long.MinValue) is
            // NEGATIVE and would slip past an abs-based guard, letting
            // w = hi - lo + 1 overflow into a corrupt bucket width
            if pc > -MaxAbsBound && pc < MaxAbsBound &&
              qc > -MaxAbsBound && qc < MaxAbsBound =>
          if (leftOut.contains(px) && rightOut.contains(qx))
            // x + pc <= y + qc + adj  ->  x - y <= qc - pc + adj
            Some(((px.exprId, qx.exprId), scala.util.Right(qc - pc + adj), px, qx))
          else if (rightOut.contains(px) && leftOut.contains(qx))
            // y + pc <= x + qc + adj  ->  x - y >= pc - qc - adj
            Some(((qx.exprId, px.exprId), scala.util.Left(pc - qc - adj), qx, px))
          else None
        case _ => None
      }
    }
  }

  private def hasEquiConjunct(
      conjuncts: Seq[Expression],
      leftOut: AttributeSet,
      rightOut: AttributeSet): Boolean =
    conjuncts.exists {
      // Both plain and null-safe equality already give Catalyst a hash-
      // joinable key; expanding the band on top would double the left
      // side for no benefit, so either form disables the rewrite.
      case EqualTo(a, b) => crossSides(a, b, leftOut, rightOut)
      case EqualNullSafe(a, b) => crossSides(a, b, leftOut, rightOut)
      case _ => false
    }

  private def crossSides(
      a: Expression,
      b: Expression,
      leftOut: AttributeSet,
      rightOut: AttributeSet): Boolean =
    (a.references.subsetOf(leftOut) && b.references.subsetOf(rightOut) &&
      a.references.nonEmpty && b.references.nonEmpty) ||
    (a.references.subsetOf(rightOut) && b.references.subsetOf(leftOut) &&
      a.references.nonEmpty && b.references.nonEmpty)

  private val Dec = org.apache.spark.sql.types.DecimalType(38, 0)

  private def decLit(v: Long): Expression =
    Literal(org.apache.spark.sql.types.Decimal(v), Dec)

  /** floor(e / w) with the dividend in DECIMAL(38,0): Long bin inputs
    * near +-2^63 (offset by up to MaxAbsBound) cannot overflow decimal
    * subtraction/Pmod, and with w >= 2 the quotient always fits a Long,
    * so the bin math is exact over the FULL integral domain — no ANSI
    * overflow where the original query succeeded, no silent wrap-around
    * misbinning with ANSI off. (Pmod is non-negative, so subtracting it
    * lands on an exact multiple of w and IntegralDivide is exact.)
    */
  private def floorDiv(e: Expression, w: Long): Expression = {
    val wl = decLit(w)
    new IntegralDivide(new Subtract(e, new Pmod(e, wl)), wl)
  }

  private def asDec(e: Expression): Expression = Cast(e, Dec)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint) if j.resolved =>
      eligibleBand(j, cond) match {
        case None => j
        case Some((x, y, lo, hi)) if lo == hi =>
          // degenerate exact-offset band (x - y = lo): a plain equi-join
          // on the shifted key, no bucket expansion needed. Decimal math
          // keeps the shift overflow-free over the full Long domain.
          val rewritten = Project(j.output,
            Filter(cond,
              Join(l, r, Inner,
                Some(EqualTo(new Subtract(asDec(x), decLit(lo)), asDec(y))),
                hint)))
          logInfo(s"BandJoinRewrite: rewrote exact-offset band join " +
            s"(${x.name} - ${y.name} = $lo) to an equi-join")
          rewritten
        case Some((x, y, lo, hi)) =>
          val w = hi - lo + 1 // >= 2: lo < hi in this branch
          val b0 = floorDiv(new Subtract(asDec(x), decLit(hi)), w)
          val leftBin =
            AttributeReference("__band_bin", LongType, nullable = b0.nullable)()
          val newLeft = Generate(
            Explode(CreateArray(Seq(b0, new Add(b0, Literal(1L, LongType))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(leftBin), child = l)
          val rBin = Alias(floorDiv(asDec(y), w), "__band_bin_r")()
          val newRight = Project(r.output :+ rBin, r)
          // the original join's hint survives on the rewritten join
          val rewritten = Project(j.output,
            Filter(cond,
              Join(newLeft, newRight, Inner,
                Some(EqualTo(leftBin, rBin.toAttribute)),
                hint)))
          logInfo(s"BandJoinRewrite: rewrote band join on " +
            s"(${x.name}, ${y.name}) in [$lo, $hi] to bucket width $w")
          rewritten
      }
  }

  /** (x, y, lo, hi) if the join is a pure integral band join. */
  private def eligibleBand(
      j: Join,
      cond: Expression): Option[(AttributeReference, AttributeReference, Long, Long)] = {
    val conjuncts = splitConjuncts(cond)
    val leftOut = j.left.outputSet
    val rightOut = j.right.outputSet
    if (hasEquiConjunct(conjuncts, leftOut, rightOut)) return None
    val bounds = conjuncts.flatMap(bound(_, leftOut, rightOut))
    // tightest hull per (x, y) pair; a hull is valid for bucketing
    // because ANDed conjuncts mean every match satisfies all bounds
    bounds.groupBy(_._1).values.flatMap { bs =>
      val los = bs.collect { case (_, scala.util.Left(v), _, _) => v }
      val his = bs.collect { case (_, scala.util.Right(v), _, _) => v }
      if (los.nonEmpty && his.nonEmpty) {
        val lo = los.max
        val hi = his.min
        // lo == hi becomes a shifted equi-join; lo < hi buckets with
        // width >= 2, which keeps the decimal floorDiv quotient within
        // Long for any input (see floorDiv)
        if (lo <= hi && lo > -MaxAbsBound && lo < MaxAbsBound &&
            hi > -MaxAbsBound && hi < MaxAbsBound)
          Some((bs.head._3, bs.head._4, lo, hi))
        else None
      } else None
    }.headOption
  }
}

/** `spark.sql.extensions` entry point: injects [[BandJoinRewrite]] into
  * every session of the deployment.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => BandJoinRewrite)
}
