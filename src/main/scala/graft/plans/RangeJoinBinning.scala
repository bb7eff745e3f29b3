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
  * Matched shape (conjuncts in any order, extra conjuncts preserved):
  *   - ≥ 1 equi conjunct `leftAttr = rightAttr` (either orientation);
  *   - a lower bound `rTs > lTs` / `rTs >= lTs` (or flipped), both plain
  *     attributes of TIMESTAMP or integral type;
  *   - an upper bound `rTs <= lTs + W` / `rTs < lTs + W` (or flipped)
  *     over the SAME pair, with `W` a foldable positive constant:
  *     a day-time interval, a calendar interval with zero months/days
  *     (month/day arithmetic is not a constant micro offset), or an
  *     integral literal for numeric bound columns.
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

    // lower bound: probe > base (strict) or probe >= base, in either
    // written orientation; both sides must be bare attributes of a
    // binnable type. `baseLeft` names which JOIN CHILD holds the window
    // BASE (the side that explodes to its window's bins) — the pattern is
    // written both ways in the wild (`b.ts > a.ts AND b.ts <= a.ts + W`
    // vs `a.ts > b.ts AND a.ts <= b.ts + W`).
    def asLower(e: Expression,
        baseLeft: Boolean): Option[(Attribute, Attribute, Boolean)] = {
      def mk(l: Expression, r: Expression, strict: Boolean) = (l, r) match {
        case (la: Attribute, ra: Attribute)
            if sideOf(la).contains(baseLeft) && sideOf(ra).contains(!baseLeft) &&
              binnableType(la.dataType) && la.dataType == ra.dataType =>
          Some((la, ra, strict))
        case _ => None
      }
      e match {
        case GreaterThan(r, l)        => mk(l, r, strict = true)
        case LessThan(l, r)           => mk(l, r, strict = true)
        case GreaterThanOrEqual(r, l) => mk(l, r, strict = false)
        case LessThanOrEqual(l, r)    => mk(l, r, strict = false)
        case _ => None
      }
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

    // `lTs + W` with W a constant positive micro/integral offset
    def asShifted(e: Expression): Option[(Attribute, Long)] = uncast(e) match {
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
      case _ => None
    }

    // upper bound: probe <= base + W (or <, or flipped orientation)
    def asUpper(e: Expression,
        baseLeft: Boolean): Option[(Attribute, Attribute, Long)] = {
      def mk(r: Expression, shifted: Expression) = (r, asShifted(shifted)) match {
        case (ra: Attribute, Some((la, w)))
            if sideOf(ra).contains(!baseLeft) && sideOf(la).contains(baseLeft) &&
              w > 0L =>
          Some((la, ra, w))
        case _ => None
      }
      e match {
        case LessThanOrEqual(r, s)    => mk(r, s)
        case LessThan(r, s)           => mk(r, s)
        case GreaterThanOrEqual(s, r) => mk(r, s)
        case GreaterThan(s, r)        => mk(r, s)
        case _ => None
      }
    }

    // the first lower/upper pair over the SAME (base, probe) attributes,
    // trying the base on the left child first, then mirrored
    def hitFor(baseLeft: Boolean): Option[(Attribute, Attribute, Boolean, Long)] = {
      val lowers = conjuncts.flatMap(asLower(_, baseLeft))
      val uppers = conjuncts.flatMap(asUpper(_, baseLeft))
      lowers.flatMap { case (la, ra, strict) =>
        uppers.collectFirst {
          case (la2, ra2, w) if la2.semanticEquals(la) && ra2.semanticEquals(ra) =>
            (la, ra, strict, w)
        }
      }.headOption
    }
    val hit = hitFor(baseLeft = true).map((_, true))
      .orElse(hitFor(baseLeft = false).map((_, false)))

    hit.map { case ((lTs, rTs, strictLower, windowUs), baseLeft) =>
      // integer micro image of the bound column: UnixMicros for
      // timestamps (exact internal micros), identity for integrals
      def us(a: Attribute): Expression = a.dataType match {
        case TimestampType => UnixMicros(a)
        case IntegerType   => Cast(a, LongType)
        case _             => a
      }
      // exact floor division (timestamps can be negative micros —
      // IntegralDivide truncates toward zero): (a - pmod(a, w)) div w
      def floorDiv(a: Expression, w: Long): Expression = {
        val wl = Literal(w, LongType)
        IntegralDivide(Subtract(a, Pmod(a, wl)), wl)
      }
      val w = windowUs // bin width = window: 1-2 bins per left row
      val lUs = us(lTs)
      val adj = if (strictLower) 1L else 0L
      val lo = floorDiv(Add(lUs, Literal(adj, LongType)), w)
      val hi = floorDiv(Add(lUs, Literal(w, LongType)), w)
      // explicit step: sequence(a, b) auto-picks direction; lo <= hi holds
      // (w >= adj), but the step must never silently flip. Sequence is
      // TimeZoneAware — unresolved until a zone is bound (inert for longs)
      val gen = Explode(Sequence(lo, hi, Some(Literal(1L, LongType)),
        Some(conf.sessionLocalTimeZone)))
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
