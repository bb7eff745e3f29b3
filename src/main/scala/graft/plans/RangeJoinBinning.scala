package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** Auto-routes equi-key + bounded-interval RANGE JOINS onto the
  * bin-bucketed plan ([[graft.engine.RangeJoin.binned]] written as a
  * Catalyst rewrite), so the user's natural SQL
  *
  * {{{
  *   ... FROM t a JOIN t b
  *   ON a.k = b.k AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
  * }}}
  *
  * stops planning as "equi-join on k, range as a post-filter". That plan
  * materializes EVERY within-key pair before filtering — O(pairs-per-key),
  * which at a 100×-denser hot key is a quadratic blowup the filter never
  * sees coming. The rewrite quantizes the bound attribute into
  * window-width bins: the left row explodes to the 1–2 bins its window
  * overlaps (a Generate), the right row computes its single bin (a
  * Project), the bin equality joins alongside the original keys, and the
  * EXACT original predicates are kept as re-checks — semantics unchanged
  * (each qualifying pair meets in exactly one bin: the right row's), only
  * the join granularity shrinks from "key" to "key × time-bin".
  *
  * Matched shape (conjuncts in any order, extra conjuncts preserved; the
  * window BASE may sit on either join child — both orientations rewrite):
  *   - ≥ 1 equi conjunct `leftAttr = rightAttr` (either orientation);
  *   - a lower bound `probe > base + S_lo` / `>=` (S_lo any constant
  *     offset, 0 for the bare-attribute form) and an upper bound
  *     `probe <= base + S_hi` / `<` over the SAME attribute pair with
  *     `S_hi > S_lo`, both attributes of TIMESTAMP or integral type.
  *     Offsets are day-time intervals, zero-month/zero-day calendar
  *     intervals (month/day arithmetic is not a constant micro offset),
  *     or integral literals — so one-sided windows
  *     (`b.ts > a.ts AND b.ts <= a.ts + W`) and symmetric proximity
  *     bands (`b.ts > a.ts - W AND b.ts <= a.ts + W`) both normalize to
  *     a `(base + S_lo, base + S_hi]` window of width `S_hi − S_lo`.
  *
  * ANSI caveat: when `spark.sql.ansi.enabled` is true and the bound
  * column is a raw integral (not a timestamp), the rule declines — near
  * the Long-domain edges the rewrite would silently drop rows the
  * unrewritten ANSI plan turns into an arithmetic-overflow error. Integral
  * range joins keep the binned plan under legacy arithmetic.
  *
  * Off-switch: `spark.graft.rangeJoinBinning.enabled = false` (default on).
  * Idempotent under the fixpoint optimizer batch: rewritten joins carry
  * the synthetic `__graft_bin` attributes in their condition and are
  * skipped on re-visit.
  */
object RangeJoinBinning extends Rule[LogicalPlan] with PredicateHelper {

  private val BinPrefix = "__graft_bin"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.rangeJoinBinning.enabled", "true").toBoolean) plan
    else plan.transformUp {
      // skips: already-rewritten joins (idempotency under the fixpoint
      // batch), hand-binned RangeJoin.binned plans (`__bin` — a second bin
      // layer is correct but pure overhead), and STREAMING joins (the
      // stream-stream state-eviction machinery keys on recognizing the raw
      // time-interval condition; rewriting it would unbound the state)
      case j @ Join(left, right, Inner, Some(cond), _)
          if !left.isStreaming && !right.isStreaming &&
            !cond.references.exists(a =>
              a.name.startsWith(BinPrefix) || a.name == "__bin") =>
        rewrite(j, cond).getOrElse(j)
    }
  }

  /** The bound pair of a range conjunct normalized to (left side expr,
    * right side expr, inclusive?) where "left/right" follow the join's
    * children, or None when the conjunct is not a usable bound.
    */
  private def rewrite(j: Join, cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val leftOut = j.left.outputSet
    val rightOut = j.right.outputSet

    def sideOf(a: Attribute): Option[Boolean] = // Some(true)=left
      if (leftOut.contains(a)) Some(true)
      else if (rightOut.contains(a)) Some(false) else None

    val hasEqui = conjuncts.exists {
      case EqualTo(a: Attribute, b: Attribute) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (!hasEqui) return None

    def binnableType(dt: DataType): Boolean = dt match {
      case TimestampType | LongType | IntegerType => true
      case _ => false
    }

    // strip the no-op cast the ANALYZED plan carries around
    // `ts + day-time-interval` (the optimizer's SimplifyCasts removes it,
    // but rule order within the fixpoint batch is not guaranteed)
    def uncast(e: Expression): Expression = e match {
      case Cast(c, dt, _, _) if dt == c.dataType => uncast(c)
      case Cast(c: TimestampAddInterval, TimestampType, _, _) => uncast(c)
      case other => other
    }

    def integral(dt: DataType): Boolean = dt match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }

    // `base + S` with S a constant SIGNED micro/integral offset — a bare
    // binnable attribute reads as shift 0, so symmetric proximity bands
    // (`r > l - W AND r <= l + W`) normalize the same way as one-sided
    // windows
    def asShifted(e: Expression): Option[(Attribute, Long)] = uncast(e) match {
      case a: Attribute if binnableType(a.dataType) => Some((a, 0L))
      case TimestampAddInterval(a: Attribute,
          Literal(us: Long, _: DayTimeIntervalType), _) =>
        Some((a, us))
      case TimestampAddInterval(a: Attribute,
          Literal(iv: CalendarInterval, CalendarIntervalType), _)
          if iv.months == 0 && iv.days == 0 =>
        Some((a, iv.microseconds))
      case Add(a: Attribute, Literal(v, dt), _) if integral(dt) =>
        Some((a, v.toString.toLong))
      case Add(Literal(v, dt), a: Attribute, _) if integral(dt) =>
        Some((a, v.toString.toLong))
      case Subtract(a: Attribute, Literal(v, dt), _) if integral(dt) =>
        Some((a, -v.toString.toLong))
      case _ => None
    }

    // lower bound: probe > base + S_lo (strict) or >= — in either written
    // orientation. `baseLeft` names which JOIN CHILD holds the window BASE
    // (the side that explodes to its window's bins); the pattern is
    // written both ways in the wild.
    def asLower(e: Expression,
        baseLeft: Boolean): Option[(Attribute, Attribute, Boolean, Long)] = {
      def mk(b: Expression, p: Expression, strict: Boolean) =
        (asShifted(b), p) match {
          case (Some((ba, s)), pa: Attribute)
              if sideOf(ba).contains(baseLeft) && sideOf(pa).contains(!baseLeft) &&
                binnableType(ba.dataType) && ba.dataType == pa.dataType =>
            Some((ba, pa, strict, s))
          case _ => None
        }
      e match {
        case GreaterThan(p, b)        => mk(b, p, strict = true)
        case LessThan(b, p)           => mk(b, p, strict = true)
        case GreaterThanOrEqual(p, b) => mk(b, p, strict = false)
        case LessThanOrEqual(b, p)    => mk(b, p, strict = false)
        case _ => None
      }
    }

    // upper bound: probe <= base + S_hi (or <, or flipped orientation).
    // A strict upper keeps hi = floorDiv(base + S_hi, w): the bin range
    // only has to COVER qualifying probes, the exact predicate re-checks.
    def asUpper(e: Expression,
        baseLeft: Boolean): Option[(Attribute, Attribute, Long)] = {
      def mk(p: Expression, b: Expression) = (p, asShifted(b)) match {
        case (pa: Attribute, Some((ba, s)))
            if sideOf(pa).contains(!baseLeft) && sideOf(ba).contains(baseLeft) &&
              binnableType(ba.dataType) && ba.dataType == pa.dataType =>
          Some((ba, pa, s))
        case _ => None
      }
      e match {
        case LessThanOrEqual(p, b)    => mk(p, b)
        case LessThan(p, b)           => mk(p, b)
        case GreaterThanOrEqual(b, p) => mk(p, b)
        case GreaterThan(b, p)        => mk(p, b)
        case _ => None
      }
    }

    // the first lower/upper pair over the SAME (base, probe) attributes
    // with a positive window S_hi − S_lo, trying the base on the left
    // child first, then mirrored. (The degenerate S_hi == S_lo band is an
    // equality in disguise; non-positive windows never match a row.)
    def hitFor(baseLeft: Boolean): Option[(Attribute, Attribute, Boolean, Long, Long)] = {
      val lowers = conjuncts.flatMap(asLower(_, baseLeft))
      val uppers = conjuncts.flatMap(asUpper(_, baseLeft))
      lowers.flatMap { case (ba, pa, strict, sLo) =>
        uppers.collectFirst {
          case (ba2, pa2, sHi)
              if ba2.semanticEquals(ba) && pa2.semanticEquals(pa) &&
                sHi > sLo &&
                // window width must itself fit a long (a proximity band
                // with shifts near ±Long.MaxValue would overflow sHi−sLo
                // in the driver arithmetic below) — else don't rewrite
                BigInt(sHi) - BigInt(sLo) <= BigInt(Long.MaxValue) =>
            (ba, pa, strict, sLo, sHi)
        }
      }.headOption
    }
    val hit = hitFor(baseLeft = true).map((_, true))
      .orElse(hitFor(baseLeft = false).map((_, false)))
      // ANSI + raw integral bound column: at the Long-domain edges the
      // rewrite's wrapping span guard DROPS single-wrap rows where the
      // unrewritten plan would throw an arithmetic-overflow error — a
      // rewrite-visible divergence. Integral bound columns are user data
      // and can sit within |S| of the edge; timestamps cannot (±2^59
      // micros), so they stay rewritable under either mode.
      .filterNot { case ((lTs, _, _, _, _), _) =>
        conf.ansiEnabled && lTs.dataType != TimestampType }

    hit.map { case ((lTs, rTs, strictLower, shiftLo, shiftHi), baseLeft) =>
      val windowUs = shiftHi - shiftLo
      // integer micro image of the bound column: UnixMicros for
      // timestamps (exact internal micros), identity for integrals
      def us(a: Attribute): Expression = a.dataType match {
        case TimestampType => UnixMicros(a)
        case IntegerType   => Cast(a, LongType)
        case _             => a
      }
      // exact floor division, overflow-safe across the FULL long domain:
      // trunc-toward-zero quotient corrected by one when a negative value
      // doesn't divide evenly. The previous (a - pmod(a, w)) div w form
      // underflows for a within w of Long.MinValue (a - pmod wraps), which
      // matters for integral bound columns — raw longs are user data;
      // timestamps only cover ±2^59 micros.
      def floorDiv(a: Expression, w: Long): Expression = {
        val wl = Literal(w, LongType)
        val zero = Literal(0L, LongType)
        Subtract(IntegralDivide(a, wl),
          If(LessThan(Remainder(a, wl), zero), Literal(1L, LongType), zero))
      }
      // wrapping add for the bin endpoints (never throws under ANSI):
      // the kept EXACT predicates re-check every candidate, so a wrapped
      // endpoint can only cost false candidates, never wrong output
      def addWrap(a: Expression, c: Long): Expression =
        Add(a, Literal(c, LongType), EvalMode.LEGACY)
      val w = windowUs // bin width = window: 1-2 bins per base row
      val lUs = us(lTs)
      val adj = if (strictLower) 1L else 0L
      // window ends are base + shiftLo .. base + shiftHi (shiftLo = 0 for
      // the canonical one-sided form, negative for proximity bands):
      // qualifying probes fall in bins [floor((base+S_lo+adj)/w),
      // floor((base+S_hi)/w)] — at most 2 bins since S_hi−S_lo = w.
      //
      // Domain-edge semantics (integral bound columns within |S| of the
      // long edges): when BOTH endpoints wrap (base within S_lo of an
      // edge with same-sign shifts) the wrapped window is exactly where
      // non-ANSI Spark's own `base + S` arithmetic points, and these bins
      // land there too — pairs the unrewritten wrap-semantics plan emits
      // still meet. When only ONE endpoint wraps, the original conjunction
      // is unsatisfiable for that row (the wrapped bound flips sign), and
      // the span guard below feeds Explode an empty array instead of a
      // domain-spanning Sequence. Under ANSI the unrewritten plan throws
      // on such rows IF the equi-join pairs them; the recheck would throw
      // for paired rows but edge rows that pair with nothing would be
      // silently dropped rather than failing the query — so ANSI + raw
      // integral bound columns are gated off above and never reach here.
      val lo = floorDiv(addWrap(lUs, shiftLo + adj), w)
      val hi = floorDiv(addWrap(lUs, shiftHi), w)
      // order-safe bounds + span guard: Sequence must never see a flipped
      // step, and a wrap-separated (lo, hi) pair must not expand to the
      // whole bin domain
      val loS = Least(Seq(lo, hi))
      val hiS = Greatest(Seq(lo, hi))
      val span = Subtract(hiS, loS, EvalMode.LEGACY)
      val spanOk = And(
        GreaterThanOrEqual(span, Literal(0L, LongType)),
        LessThanOrEqual(span, Literal(2L, LongType)))
      // explicit step: sequence(a, b) auto-picks direction; the step must
      // never silently flip. Sequence is TimeZoneAware — unresolved until
      // a zone is bound (inert for longs)
      val bins = If(spanOk,
        Sequence(loS, hiS, Some(Literal(1L, LongType)),
          Some(conf.sessionLocalTimeZone)),
        Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
      val gen = Explode(bins)
      val binBase = AttributeReference(s"${BinPrefix}_l",
        LongType, nullable = gen.elementSchema.head.nullable)()
      val baseChild = if (baseLeft) j.left else j.right
      val probeChild = if (baseLeft) j.right else j.left
      val exploded = Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(binBase), child = baseChild)
      val binProbe = Alias(floorDiv(us(rTs), w), s"${BinPrefix}_r")()
      val projected = Project(probeChild.output :+ binProbe, probeChild)
      val newCond = And(cond, EqualTo(binBase, binProbe.toAttribute))
      val rewritten =
        if (baseLeft) j.copy(left = exploded, right = projected,
          condition = Some(newCond))
        else j.copy(left = projected, right = exploded,
          condition = Some(newCond))
      // original output, original attr ids — parents never see the bins
      Project(j.output, rewritten)
    }
  }
}
