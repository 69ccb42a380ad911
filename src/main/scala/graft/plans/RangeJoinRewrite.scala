package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Catalyst optimizer rule: the binned range-join rewrite for SQL users.
  *
  * [[graft.ops.RangeJoin.pointInInterval]] gives DataFrame callers a
  * nested-loop-free plan for point-in-interval joins, but a SQL user writing
  * the natural form — `FROM a JOIN b ON b.ts BETWEEN a.lo AND a.hi` — still
  * gets BroadcastNestedLoopJoin (keyless) or a key-only SMJ whose hot-key
  * groups degenerate quadratically. This rule rewrites the LOGICAL join so
  * the same SQL text plans as the binned equi-join, without the query
  * changing: quantize both bound expressions and the point expression into
  * fixed-width bins, explode the interval side across its touched bins
  * (`Generate(Explode(Sequence(...)))`), and join on bin equality with the
  * ORIGINAL condition kept as the residual — each candidate pair meets in
  * exactly one bin (the point's), so the rewrite is row-for-row equivalent
  * by construction (property-tested against the unrewritten plan).
  *
  * Conservatively scoped, opt-in:
  *   - fires only when `spark.graft.rangeJoin.binWidthSec` is a positive
  *     long (unset/0 = rule is a no-op for every query — the default);
  *   - inner joins with a deterministic condition only;
  *   - the matched pattern is a conjunct pair bounding one side's timestamp
  *     expression by two expressions of the other side (any comparison
  *     orientation, strict or inclusive);
  *   - the same runaway-interval guard as the operator:
  *     `spark.graft.rangeJoin.maxBinsPerInterval` (default 2²⁰) fails the
  *     job via `raise_error` instead of silently exploding the shuffle;
  *   - self-recursion is excluded by the `__graft_bin` marker attributes the
  *     rewrite introduces (the optimizer batch runs to fixed point).
  *
  * Injected by [[graft.functions.GraftExtensions]] via
  * `injectOptimizerRule`, completing the engine's Catalyst ladder: native
  * expressions (`doGenCode`) for scalar hot loops, a logical `Rule` where
  * the win is a different JOIN SHAPE rather than a faster expression.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.rangeJoin.binWidthSec"
  val MaxBinsConf = "spark.graft.rangeJoin.maxBinsPerInterval"
  private val Mark = "__graft_bin"

  /** A malformed conf would otherwise surface as a raw
    * NumberFormatException from the optimizer on EVERY query in the
    * session (the rule is session-injected), with nothing pointing at the
    * key — name the key and the accepted form instead. Loud, not silent:
    * treating "30m" as off would leave the user believing the rewrite is
    * active (the Submit option-grammar lesson).
    */
  private def longConf(key: String, default: String): Long = {
    val raw = conf.getConfString(key, default)
    try raw.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$key must be a whole number (of seconds / bins), got '$raw' — " +
          "duration syntax like '30m' is not supported")
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val widthSec = longConf(WidthConf, "0")
    if (widthSec <= 0) return plan
    val maxBins = longConf(MaxBinsConf, (1 << 20).toString)
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), _)
          if cond.deterministic && !alreadyRewritten(j) =>
        rewrite(j, l, r, cond, widthSec, maxBins).getOrElse(j)
    }
  }

  /** The inner join produced by a previous firing exposes marker attributes
    * on its inputs; the outer Project strips them from everything above, so
    * this guard exactly identifies our own output and nothing else.
    */
  private def alreadyRewritten(j: Join): Boolean =
    (j.left.output ++ j.right.output).exists(_.name.startsWith(Mark))

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** (point expr, point side is left?, bound expr) for a conjunct that
    * compares a timestamp expression of one side against an expression of
    * the other; `lower = true` for `pt >= / > bound` forms.
    */
  private case class Bound(pt: Expression, ptOnLeft: Boolean, bound: Expression, lower: Boolean)

  private def boundsOf(c: Expression, lOut: AttributeSet, rOut: AttributeSet): Seq[Bound] = {
    def side(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(lOut)) Some(true)
      else if (refs.subsetOf(rOut)) Some(false)
      else None
    }
    def mk(pt: Expression, bound: Expression, lower: Boolean): Seq[Bound] =
      (side(pt), side(bound)) match {
        case (Some(ps), Some(bs)) if ps != bs && isTs(pt) && isTs(bound) =>
          Seq(Bound(pt, ps, bound, lower))
        case _ => Nil
      }
    c match {
      // each comparison yields both readings (x as point / y as point); the
      // pair-matching step keeps only combinations whose sides line up
      case GreaterThanOrEqual(x, y) => mk(x, y, lower = true) ++ mk(y, x, lower = false)
      case GreaterThan(x, y) => mk(x, y, lower = true) ++ mk(y, x, lower = false)
      case LessThanOrEqual(x, y) => mk(x, y, lower = false) ++ mk(y, x, lower = true)
      case LessThan(x, y) => mk(x, y, lower = false) ++ mk(y, x, lower = true)
      case _ => Nil
    }
  }

  private def isTs(e: Expression): Boolean =
    e.dataType == TimestampType || e.dataType == TimestampNTZType

  private def asTs(e: Expression): Expression =
    if (e.dataType == TimestampType) e
    // Cast is TimeZoneAwareExpression for NTZ→TZ — without an explicit zone
    // the node is unresolved (same failure mode as Sequence)
    else Cast(e, TimestampType, Some(conf.sessionLocalTimeZone))

  private def micros(e: Expression): Expression = UnixMicros(asTs(e))

  /** Floor (not truncating) division keeps bins aligned across the epoch;
    * the numerator is an exact multiple of `w`, so IntegralDivide is exact.
    */
  private def floorDiv(x: Expression, w: Long): Expression =
    IntegralDivide(Subtract(x, Pmod(x, Literal(w))), Literal(w))

  private def rewrite(
      j: Join,
      l: LogicalPlan,
      r: LogicalPlan,
      cond: Expression,
      widthSec: Long,
      maxBins: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(cond)
    if (!conjuncts.forall(_.deterministic)) return None
    val bounds = conjuncts.flatMap(boundsOf(_, l.outputSet, r.outputSet))
    val pair = (for {
      lo <- bounds.iterator.filter(_.lower)
      hi <- bounds.iterator.filter(!_.lower)
      if lo.ptOnLeft == hi.ptOnLeft && lo.pt.semanticEquals(hi.pt)
    } yield (lo, hi)).nextOption()
    pair.map { case (lo, hi) =>
      val w = widthSec * 1000000L
      val ptOnLeft = lo.ptOnLeft
      val (iPlan, pPlan) = if (ptOnLeft) (r, l) else (l, r)

      // interval side: drop empty intervals (also guards Sequence against a
      // descending range), fail runaway spans loudly, explode touched bins
      val loUs = micros(lo.bound)
      val hiUs = micros(hi.bound)
      val binLo = floorDiv(loUs, w)
      val binHi = floorDiv(hiUs, w)
      val nBins = Add(Subtract(binHi, binLo), Literal(1L))
      val guardedHi = If(
        LessThanOrEqual(nBins, Literal(maxBins)),
        binHi,
        Cast(RaiseError(Literal(
          s"RangeJoinRewrite: interval spans more than $maxBins bins of " +
            s"${widthSec}s — widen $WidthConf or fix the interval")), LongType))
      val iFiltered = Filter(LessThanOrEqual(loUs, hiUs), iPlan)
      val iBin = AttributeReference(s"${Mark}_i", LongType)()
      // Sequence is TimeZoneAwareExpression — without an explicit zone the
      // node is unresolved and the optimizer rejects the rewritten plan
      val binSeq = new Sequence(binLo, guardedHi, None)
        .withTimeZone(conf.sessionLocalTimeZone)
      val iGen = Generate(
        Explode(binSeq),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(iBin), child = iFiltered)

      // point side: a single bin per row
      val pBinAlias = Alias(floorDiv(micros(lo.pt), w), s"${Mark}_p")()
      val pProj = Project(pPlan.output :+ pBinAlias, pPlan)

      val binEq = EqualTo(iBin, pBinAlias.toAttribute)
      // the FULL original condition stays as the residual: the planner still
      // extracts its equi conjuncts as join keys alongside the bin equality,
      // and the range conjuncts filter same-bin near-misses
      val (nl, nr) = if (ptOnLeft) (pProj, iGen) else (iGen, pProj)
      val rejoined = Join(nl, nr, Inner, Some(And(binEq, cond)), j.hint)
      Project(j.output, rejoined)
    }
  }
}
