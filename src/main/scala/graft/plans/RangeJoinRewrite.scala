package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** Catalyst optimizer rule: rewrites naive bounded-range joins into the
  * banded (time-bucketed) equi-join form automatically.
  *
  * A user writing
  * {{{
  *   a.join(b, a("user_id") === b("user_id")
  *     && b("ts") > a("ts") && b("ts") <= a("ts") + expr("INTERVAL 1 HOUR"))
  * }}}
  * gets, without this rule, a sort-merge join on `user_id` that materializes
  * the full per-key cross product before filtering — and with NO equi keys a
  * BroadcastNestedLoopJoin, which is O(|L|·|R|) and unusable at 100 TB. This
  * rule detects a two-sided bound `lo ⩽ tR − tL ⩽ hi` (strict or not, with
  * foldable interval/numeric offsets), then:
  *
  *  1. picks a power-of-two bin width `W = 2^k ≥ hi − lo` and bins the time
  *     axis with an arithmetic shift (`ShiftRight` = exact floor division,
  *     monotone, negative-safe — no eval-mode ambiguity);
  *  2. explodes each LEFT row to the bins covering `[tL+lo, tL+hi]` — at
  *     most 2 because the bin is at least as wide as the window — via a
  *     `Generate(Explode(Sequence(binLo, binHi)))` node;
  *  3. equi-joins on (original equi keys…, bin), keeping EVERY original
  *     conjunct as the exact predicate, and projects the bands away.
  *
  * Correctness: binning is monotone and the enumerated bins cover the whole
  * admissible interval, so every pair satisfying the original predicates
  * meets in some bin; the original predicates then filter the (small)
  * candidate set exactly. The shuffle carries ≈2× the left side + 1× the
  * right instead of a per-key cross product. This is the composition the
  * hand-written banded join in `operators/TimeWindows` uses — here applied
  * transparently by the optimizer, the `Rule[LogicalPlan]` tier of
  * SURVEY.md §7.3 (the reference engine has no optimizer; its single join,
  * R/main.R:305-320, is a hash merge on a dim key).
  *
  * Scope guards (documented, conservative): inner joins only (banding
  * duplicates left rows, which outer/semi semantics would observe), batch
  * only (stream-stream joins carry watermark state the rewrite must not
  * disturb), fires once (the injected `__graft_band` name marks a rewritten
  * join), disabled via `spark.graft.rangeJoin.enabled=false`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val BandName = "__graft_band"

  /** d = tR − tL compared against a constant: lower or upper bound. */
  private case class RangeBound(
      lAttr: Attribute, rAttr: Attribute, bound: Long, isLower: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean)
      return plan
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint)
          if !l.isStreaming && !r.isStreaming &&
            !cond.references.exists(_.name.startsWith(BandName)) =>
        rewrite(l, r, cond, hint).getOrElse(j)
    }
  }

  /** Reduce `e` to (attribute, additive constant offset) in band units —
    * micros for timestamps, DAYS for dates, the raw value for integral
    * columns. A Cast(date -> timestamp) is NOT unwrapped: the comparison
    * then happens in micros while a DateType attribute bands in days, so
    * folding its offsets onto the date attr would band in the wrong unit
    * and silently drop every true pair (found by review; covered by the
    * mixed-unit regression test). */
  private def boundOf(e: Expression): Option[(Attribute, Long)] = e match {
    case a: AttributeReference => Some((a, 0L))
    case c: Cast
        if (c.dataType == TimestampType &&
            c.child.dataType != DateType) ||
          (c.dataType == LongType && c.child.dataType == IntegerType) =>
      boundOf(c.child)
    case t: TimestampAddInterval if t.interval.foldable =>
      for {
        (a, o) <- boundOf(t.start)
        m <- intervalMicros(t.interval)
      } yield (a, o + m)
    case ad: Add if ad.right.foldable =>
      boundOf(ad.left).flatMap { case (a, o) => longVal(ad.right).map(v => (a, o + v)) }
    case ad: Add if ad.left.foldable =>
      boundOf(ad.right).flatMap { case (a, o) => longVal(ad.left).map(v => (a, o + v)) }
    case s: Subtract if s.right.foldable =>
      boundOf(s.left).flatMap { case (a, o) => longVal(s.right).map(v => (a, o - v)) }
    // date_add / date_sub keep the DATE unit (days) — consistent with
    // micros() banding dates via UnixDate below.
    case da: DateAdd if da.days.foldable =>
      boundOf(da.startDate).flatMap { case (a, o) => longVal(da.days).map(v => (a, o + v)) }
    case ds: DateSub if ds.days.foldable =>
      boundOf(ds.startDate).flatMap { case (a, o) => longVal(ds.days).map(v => (a, o - v)) }
    case _ => None
  }

  /** Exact micros of a foldable interval; None when the length is not a
    * fixed number of micros (year-month, or calendar days across DST). */
  private def intervalMicros(e: Expression): Option[Long] = e.dataType match {
    case _: DayTimeIntervalType =>
      Option(e.eval()).map(_.asInstanceOf[Long])
    case CalendarIntervalType =>
      Option(e.eval()).map(_.asInstanceOf[CalendarInterval]).collect {
        case ci if ci.months == 0 && ci.days == 0 => ci.microseconds
      }
    case _ => None
  }

  private def longVal(e: Expression): Option[Long] = Option(e.eval()).collect {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  /** Timestamp, date, and widening-integral attrs are bandable. */
  private def bandable(a: Attribute): Boolean = a.dataType match {
    case TimestampType | DateType | LongType | IntegerType => true
    case _ => false
  }

  /** The attribute's band unit: a bound is only meaningful between two
    * attrs measured in the same unit (micros vs days vs raw integral). */
  private def unit(a: Attribute): Int = a.dataType match {
    case TimestampType => 0
    case DateType => 1
    case _ => 2
  }

  private def micros(a: Attribute): Expression = a.dataType match {
    case TimestampType => UnixMicros(a)
    case DateType => Cast(UnixDate(a), LongType) // days since epoch
    case LongType => a
    case IntegerType => Cast(a, LongType)
    case t => throw new IllegalStateException(s"unbandable $t")
  }

  private def rewrite(
      l: LogicalPlan, r: LogicalPlan, cond: Expression,
      hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    val bounds = conjuncts.flatMap {
      case cmp: BinaryComparison =>
        val lower = cmp.isInstanceOf[GreaterThan] ||
          cmp.isInstanceOf[GreaterThanOrEqual]
        val upper = cmp.isInstanceOf[LessThan] ||
          cmp.isInstanceOf[LessThanOrEqual]
        if (!lower && !upper) None
        else (boundOf(cmp.left), boundOf(cmp.right)) match {
          // x cmp y with x ≡ aR + ox on the right input, y ≡ aL + oy on the
          // left input: tR + ox ⋛ tL + oy  ⇒  d ⋛ oy − ox (same direction).
          case (Some((ar, ox)), Some((al, oy)))
              if r.outputSet.contains(ar) && l.outputSet.contains(al) &&
                bandable(ar) && bandable(al) && unit(ar) == unit(al) =>
            Some(RangeBound(al, ar, oy - ox, isLower = lower))
          // mirrored: x on the left input ⇒ direction flips.
          case (Some((al, ox)), Some((ar, oy)))
              if l.outputSet.contains(al) && r.outputSet.contains(ar) &&
                bandable(ar) && bandable(al) && unit(ar) == unit(al) =>
            Some(RangeBound(al, ar, ox - oy, isLower = upper))
          case _ => None
        }
      case _ => None
    }

    // First (tL, tR) pair carrying both a lower and an upper bound; the
    // envelope [max(lo), min(hi)] contains the admissible region exactly.
    val byPair = bounds.groupBy(b => (b.lAttr.exprId, b.rAttr.exprId))
    byPair.collectFirst {
      case (_, bs)
          if bs.exists(_.isLower) && bs.exists(!_.isLower) &&
            bs.filter(_.isLower).map(_.bound).max <
              bs.filterNot(_.isLower).map(_.bound).min + 1 =>
        val lo = bs.filter(_.isLower).map(_.bound).max
        val hi = bs.filterNot(_.isLower).map(_.bound).min
        (bs.head.lAttr, bs.head.rAttr, lo, hi)
    }.map { case (tL, tR, lo, hi) =>
      val span = math.max(hi - lo, 1L)
      // W = 2^shift > span ⇒ [tL+lo, tL+hi] covers ≤ 2 bins.
      val shift = 64 - java.lang.Long.numberOfLeadingZeros(span)
      def bin(m: Expression): Expression = ShiftRight(m, Literal(shift))

      val binLo = bin(Add(micros(tL), Literal(lo)))
      val binHi = bin(Add(micros(tL), Literal(hi)))
      // ≤2 bins by construction (W > span); Sequence would need a resolved
      // timeZoneId (TimeZoneAwareExpression), so enumerate directly.
      val binArr = If(GreaterThan(binHi, binLo),
        CreateArray(Seq(binLo, binHi)), CreateArray(Seq(binLo)))
      // nullable: a null tL yields a single null band row (which can never
      // equi-match, same as the original null-comparison semantics) — the
      // attribute must admit it or codegen may elide the null check.
      val bandL = AttributeReference(BandName, LongType,
        nullable = tL.nullable)()
      val banded = Generate(Explode(binArr),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bandL), child = l)

      val bandRAlias = Alias(bin(micros(tR)), BandName + "_r")()
      val projR = Project(r.output :+ bandRAlias, r)

      val newCond = (EqualTo(bandL, bandRAlias.toAttribute) +: conjuncts)
        .reduce(And)
      Project(l.output ++ r.output,
        Join(banded, projR, Inner, Some(newCond), hint))
    }
  }
}
