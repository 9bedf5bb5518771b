package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Catalyst optimizer rule: rewrite point-in-interval joins to the
  * binned equi-join shape of [[graft.operators.RangeJoin]] —
  * automatically, for any `df.join(iv, p >= s && p < e)` the user
  * writes.
  *
  * Spark plans a join whose condition has no equality conjunct as a
  * BroadcastNestedLoopJoin (or cartesian product): O(|P|x|I|) row
  * comparisons, catastrophic at scale. This rule detects the
  * range-join pattern in the (already optimized) join condition:
  *
  *   lower:  `p >= s` or `p > s`   (point vs one side's column)
  *   upper:  `p <  e` or `p <= e`  (same point, bound same other side)
  *
  * with `p` typed timestamp or long, and rewrites
  *
  *   Join(P, I, Inner, lower && upper && rest)
  * to
  *   Project(origOutput,
  *     Join(Project(P, +bin(p)),
  *          Generate(explode(sequence(bin(s), bin(e'))), I),
  *          Inner, _bin_p = _bin_i && lower && upper && rest))
  *
  * The equality conjunct lets the planner pick a hash/sort-merge join;
  * the original conjuncts stay in the condition, so the rewrite is
  * correctness-preserving for ANY interval data: inverted/empty
  * intervals (which can contain no point) produce an empty bin array
  * and drop out at the explode, and intervals spanning more than
  * `spark.graft.rangeJoin.maxBins` bins fail fast with an actionable
  * error instead of materializing a giant array. Every qualifying pair
  * still meets in exactly one bin — the point's — so no dedup is
  * needed.
  *
  * Opt-in via `spark.graft.rangeJoin.enabled=true`;
  * `spark.graft.rangeJoin.binMicros` (default 1h) should be >= the
  * typical interval width so intervals explode to <= 2 bins.
  */
case class RangeJoinRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private val BinL = "_graft_bin_p"
  private val BinR = "_graft_bin_i"

  private def enabled: Boolean =
    spark.conf.get("spark.graft.rangeJoin.enabled", "false").toBoolean

  /** None (rule disabled, warn once per apply) on a non-positive or
    * unparseable width — never an opaque throw inside the optimizer. */
  private def binWidth: Option[Long] = {
    val raw = spark.conf.get("spark.graft.rangeJoin.binMicros",
      (3600L * 1000000L).toString)
    raw.toLongOption.filter(_ > 0).orElse {
      logWarning(s"spark.graft.rangeJoin.binMicros='$raw' invalid " +
        "(need a positive long); range-join rewrite disabled")
      None
    }
  }

  /** Intervals spanning more bins than this fail fast with an
    * actionable message instead of materializing a giant bin array. */
  private def maxBins: Long =
    spark.conf.get("spark.graft.rangeJoin.maxBins", "8192")
      .toLongOption.filter(_ > 0).getOrElse(8192L)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) plan
    else binWidth match {
      case None => plan
      case Some(width) =>
        val cap = maxBins
        plan.transformUp {
          case j @ Join(_, _, Inner, Some(cond), _)
              if !cond.references.exists(a => a.name == BinL || a.name == BinR) =>
            rewrite(j, width, cap).getOrElse(j)
        }
    }
  }

  /** Normalized one-sided comparison: point OP bound. */
  private case class Bound(point: Expression, bound: Expression,
                           inclusiveUpper: Boolean)

  private def asLower(e: Expression): Option[(Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(p, s) => Some((p, s))
      case GreaterThan(p, s)        => Some((p, s))
      case LessThanOrEqual(s, p)    => Some((p, s))
      case LessThan(s, p)           => Some((p, s))
      case _                        => None
    }

  private def asUpper(e: Expression): Option[(Expression, Expression, Boolean)] =
    e match {
      case LessThan(p, x)           => Some((p, x, false))
      case LessThanOrEqual(p, x)    => Some((p, x, true))
      case GreaterThan(x, p)        => Some((p, x, false))
      case GreaterThanOrEqual(x, p) => Some((p, x, true))
      case _                        => None
    }

  private def supportedType(e: Expression): Boolean =
    e.dataType == TimestampType || e.dataType == TimestampNTZType ||
      e.dataType == LongType

  /** Epoch micros as a long expression. */
  private def micros(e: Expression): Expression = e.dataType match {
    case TimestampType => UnixMicros(e)
    case TimestampNTZType =>
      // the operator's conversion (RangeJoin.microsOf): NTZ resolves
      // through the session timezone — pinned UTC engine-wide
      UnixMicros(Cast(e, TimestampType,
        Some(spark.sessionState.conf.sessionLocalTimeZone)))
    case _ => e
  }

  /** Floor-division bin (matches RangeJoin.binOf: pre-epoch safe). */
  private def binOf(x: Expression, width: Long): Expression = {
    val b = Literal(width)
    Subtract(IntegralDivide(x, b),
      If(LessThan(Remainder(x, b), Literal(0L)), Literal(1L), Literal(0L)))
  }

  private def rewrite(j: Join, width: Long, cap: Long): Option[LogicalPlan] = {
    val (left, right, hint) = (j.left, j.right, j.hint)
    val cond = j.condition.get
    val conjuncts = splitConjunctivePredicates(cond)

    // side classification: all refs from exactly one child
    def sideOf(e: Expression): Option[Boolean] = { // true = left
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None
    }

    val lowers = conjuncts.flatMap(c => asLower(c).map(c -> _))
    val uppers = conjuncts.flatMap(c => asUpper(c).map(c -> _))

    val candidates = for {
      (_, (pL, s)) <- lowers
      (_, (pU, e, incl)) <- uppers
      if pL.semanticEquals(pU) && supportedType(pL)
      pointSide <- sideOf(pL).toSeq
      boundSide <- sideOf(s).toSeq
      if sideOf(e).contains(boundSide) && boundSide != pointSide
      if s.dataType == pL.dataType && e.dataType == pL.dataType
    } yield (pL, s, e, incl, pointSide)

    candidates.headOption.map { case (p, s, e, incl, pointOnLeft) =>
      val binP = Alias(binOf(micros(p), width), BinL)()
      val start = binOf(micros(s), width)
      val stop = if (incl) binOf(micros(e), width)
                 else binOf(Subtract(micros(e), Literal(1L)), width)
      // Oversized spans (open-ended sentinel bounds, binMicros far too
      // small) would explode to millions of rows or overflow the array
      // limit mid-query — fail fast with an actionable message instead.
      // Guard on span >= cap (bin count is span+1) OR span < 0: in the
      // non-inverted branch below stop >= start, so a negative span can
      // only mean Subtract wrapped around Long.MaxValue (sentinel
      // bounds) — without this check the overflow would BYPASS the cap.
      val span = Subtract(stop, start)
      val guardedStop = If(
        Or(GreaterThanOrEqual(span, Literal(cap)),
          LessThan(span, Literal(0L))),
        Cast(new RaiseError(Literal(
          s"graft range-join rewrite: an interval spans $cap bins or " +
            "more; raise spark.graft.rangeJoin.binMicros (or maxBins), " +
            "or disable spark.graft.rangeJoin.enabled")), LongType),
        stop)
      // Sequence is TimeZoneAwareExpression: without an explicit zone it
      // stays unresolved and fails post-rule plan validation
      val seq = Sequence(start, guardedStop, None,
        Some(spark.sessionState.conf.sessionLocalTimeZone))
      // Inverted/empty intervals can't contain any point (the retained
      // bound conjuncts are unsatisfiable) — drop them at the explode
      // rather than letting Sequence default to a DESCENDING step and
      // enumerate every bin in between.
      val bins = If(LessThan(stop, start),
        Literal.create(Array.empty[Long], seq.dataType), seq)
      val binI = AttributeReference(BinR, LongType,
        nullable = bins.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
          .containsNull)()
      def addBin(side: LogicalPlan): LogicalPlan =
        Project(side.output :+ binP, side)
      def addExplode(side: LogicalPlan): LogicalPlan =
        Generate(Explode(bins), Nil, outer = false, None, Seq(binI), side)
      val (newLeft, newRight) =
        if (pointOnLeft) (addBin(left), addExplode(right))
        else (addExplode(left), addBin(right))
      val newCond = And(EqualTo(binP.toAttribute, binI), cond)
      Project(j.output.toSeq,
        Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}
