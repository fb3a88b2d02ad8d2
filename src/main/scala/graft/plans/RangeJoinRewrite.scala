package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Optimizer rule: rewrite a pure range join — an inner join whose only
 * cross-side condition is `lo <= p <= hi` on integral columns — into a
 * bin equi-join. Catalyst can only plan such a join as a
 * BroadcastNestedLoopJoin (O(n*m) compares; the build side must also fit
 * in memory), which is the classic scale cliff for
 * point-in-interval/window-neighborhood queries. The rewrite is the
 * logical-plan form of `TemporalJoin.intervalJoin`:
 *
 *  - the interval side explodes the bin range `[lo/w, hi/w]` (one
 *    `Generate(Explode(Sequence(...)))`, w = the configured bin width);
 *  - the point side projects its single bin `p/w`;
 *  - the join becomes an EQUI-join on the bin with the ORIGINAL range
 *    condition kept as residual — every matching pair meets in exactly
 *    one bin (the point's), so no duplicates and no distinct pass;
 *  - a final Project restores the original output attributes.
 *
 * Division is `IntegralDivide` (truncation): both sides map through the
 * same monotone function, so `lo <= p <= hi` implies
 * `lo/w <= p/w <= hi/w` and the bin join never loses a pair; the
 * residual keeps exactness regardless of the binning convention.
 *
 * Bin width via `spark.graft.rangejoin.binwidth` (in the join columns'
 * own units): a positive long pins it; `off` (or any non-positive value)
 * disables the rule; unset or `auto` (the default) DERIVES it per join
 * from a bounded sample of the interval side — the median span, floored
 * at max-sampled-span/256 so with the default maxbins an interval must
 * span >16x the widest SAMPLED span before the fan-out guard raises
 * (the corrupt-end-date contract; pin the conf to trade differently).
 * A useful width is data-dependent (near the typical span: too small
 * replicates intervals, too large degenerates toward one bin — the
 * residual then does the work, still correct), which is why the
 * derivation samples rather than guessing a constant. The probe runs
 * the interval sub-plan through a LIMIT, and ONLY when that sub-plan is
 * scan-shaped (leaf/project/filter/limit — where LIMIT short-circuits);
 * through an aggregate/join it would execute the full upstream shuffle
 * at optimization time, so those sides are never probed. One job per
 * distinct canonicalized sub-plan (cached, bounded eviction), with a
 * re-entrancy guard so the probe's own optimization never recurses;
 * derivation failure (empty side, streaming source, non-scan shape,
 * probe error) leaves the join untouched rather than failing the query.
 *
 * Scope guards: inner joins only; exactly one lower and one upper bound
 * on the SAME point expression, each referencing opposite sides; any
 * other cross-side conjunct (including an equality, which would make the
 * join hash-joinable anyway) disables the rewrite; integral types only.
 * Single-side conjuncts (e.g. inferred IsNotNull) ride along in the
 * residual. The rewritten join carries an equality conjunct, so the rule
 * cannot re-trigger inside the fixed-point optimizer batch.
 */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BinWidthKey = "spark.graft.rangejoin.binwidth"
  val MaxBinsKey = "spark.graft.rangejoin.maxbins"

  private case class RangeShape(point: Expression, lo: Expression, hi: Expression,
      pointOnLeft: Boolean)

  private def longConf(key: String, default: Long): Long = {
    val raw = SQLConf.get.getConfString(key, default.toString)
    // a malformed value must not surface as a bare NumberFormatException
    // from inside the optimizer on EVERY query — name the key
    raw.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"$key must be a long, got '$raw'"))
  }

  /** Rows the derivation probe reads from the interval side. Biased to
    * the first partitions (LIMIT short-circuits) — acceptable for a
    * width heuristic; the residual keeps exactness whatever the width. */
  private val SampleRows = 10000

  /** Derived widths per canonicalized probe plan: the probe is one job
    * per DISTINCT interval sub-plan, not one per optimization pass. A
    * non-positive cached value records a failed derivation (don't retry
    * every query). Cleared when it grows past 64 plans. */
  private val derivedWidths =
    new java.util.concurrent.ConcurrentHashMap[LogicalPlan, java.lang.Long]()

  /** Re-entrancy guard: optimizing the probe itself must not derive. */
  private val deriving = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = SQLConf.get.getConfString(BinWidthKey, "auto").trim
    val fixed: Option[Long] = raw match {
      case "auto" | "" => None
      case "off"       => return plan
      case _ =>
        // a malformed value must not surface as a bare
        // NumberFormatException from inside the optimizer on EVERY query
        val v = raw.toLongOption.getOrElse(throw new IllegalArgumentException(
          s"$BinWidthKey must be a long, 'auto', or 'off', got '$raw'"))
        if (v <= 0) return plan else Some(v)
    }
    if (deriving.get()) return plan
    val maxBins = longConf(MaxBinsKey, 4096L)
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        detect(j, cond) match {
          case Some(shape) =>
            val intervalPlan = if (shape.pointOnLeft) j.right else j.left
            fixed.orElse(deriveWidth(intervalPlan, shape)) match {
              case Some(w) => rewrite(j, cond, shape, w, maxBins)
              case None    => j
            }
          case None => j
        }
    }
  }

  /** The probe is only worth running when LIMIT short-circuits: over a
    * scan-shaped sub-plan (leaf/project/filter/limit/alias) it reads a
    * handful of partitions; through an aggregate/join/sort it would
    * execute the full upstream shuffle at OPTIMIZATION time (including
    * from explain()), which "one tiny job" must never mean. Anything
    * heavier -> no derivation, join left untouched, conf still works. */
  private def sampleable(plan: LogicalPlan): Boolean = plan match {
    case _: org.apache.spark.sql.catalyst.plans.logical.LeafNode => true
    case p @ (_: Project | _: org.apache.spark.sql.catalyst.plans.logical.Filter |
              _: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit |
              _: org.apache.spark.sql.catalyst.plans.logical.LocalLimit |
              _: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias |
              _: org.apache.spark.sql.catalyst.plans.logical.Sample) =>
      p.children.forall(sampleable)
    case _ => false
  }

  /** Sampled-median bin width of the interval side, or None when it
    * cannot be derived (streaming side, non-scan-shaped side, empty
    * sample, probe failure). */
  private def deriveWidth(intervalPlan: LogicalPlan, s: RangeShape): Option[Long] = {
    if (intervalPlan.isStreaming || !sampleable(intervalPlan)) return None
    def toLong(e: Expression): Expression =
      if (e.dataType == LongType) e else Cast(e, LongType)
    val span = Alias(Subtract(toLong(s.hi), toLong(s.lo)), "_graft_span")()
    val probe = org.apache.spark.sql.catalyst.plans.logical.Limit(
      Literal(SampleRows), Project(Seq(span), intervalPlan))
    val key = probe.canonicalized
    val cached = derivedWidths.get(key)
    if (cached != null) return if (cached > 0) Some(cached.longValue()) else None
    val session = org.apache.spark.sql.SparkSession.getActiveSession.orNull
    if (session == null) return None
    deriving.set(java.lang.Boolean.TRUE)
    val w: Long = try {
      val rows = org.apache.spark.sql.graft.Bridge.collectPlan(session, probe)
      // inverted (negative-span) intervals match nothing — exclude them
      // from the estimate rather than dragging the median toward 0
      val spans = rows.iterator.filterNot(_.isNullAt(0)).map(_.getLong(0))
        .filter(_ >= 0L).toArray
      if (spans.isEmpty) -1L
      else {
        java.util.Arrays.sort(spans)
        val median = spans(spans.length / 2)
        val widest = spans(spans.length - 1)
        // the widest/256 floor keeps the runtime fan-out guard from
        // failing data the sample merely under-represented: with
        // maxBins 4096 an interval must span >16x the widest SAMPLED
        // span to raise — the corrupt-end-date contract, not a
        // heavy-tail surprise. Pin the conf to trade differently.
        math.max(1L, math.max(median, widest / 256L))
      }
    } catch { case scala.util.control.NonFatal(_) => -1L }
    finally deriving.set(java.lang.Boolean.FALSE)
    if (derivedWidths.size > 64) {
      // bounded eviction of ONE arbitrary entry — clearing wholesale
      // would re-trigger a probe job for every live range join whenever
      // one churning plan key (e.g. an appended-to parquet directory)
      // overflows the map
      val it = derivedWidths.keys()
      if (it.hasMoreElements) derivedWidths.remove(it.nextElement())
    }
    derivedWidths.put(key, w)
    if (w > 0) Some(w) else None
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** Cross-side comparison as (point, bound, isLower) with the point on
    * `pointLeft` side — or None if the conjunct is not that shape. */
  private def asBound(e: Expression, j: Join): Option[(Expression, Expression, Boolean, Boolean)] = {
    def side(x: Expression): Option[Boolean] = {
      val refs = x.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(j.left.outputSet)) Some(true)
      else if (refs.subsetOf(j.right.outputSet)) Some(false)
      else None
    }
    val cmp: Option[(Expression, Expression, Boolean)] = e match {
      case GreaterThanOrEqual(a, b) => Some((a, b, true)) // a >= b: a lower-bounded by b
      case GreaterThan(a, b)        => Some((a, b, true))
      case LessThanOrEqual(a, b)    => Some((a, b, false)) // a <= b: b upper-bounds a
      case LessThan(a, b)           => Some((a, b, false))
      case _                        => None
    }
    cmp.flatMap { case (a, b, aIsLowerBounded) =>
      (side(a), side(b)) match {
        case (Some(sa), Some(sb)) if sa != sb && integral(a) && integral(b) =>
          // normalize to (point, bound): either operand may be the point —
          // the caller disambiguates by finding the expression common to
          // both conjuncts. Emit both orientations' info compactly:
          // (a, b, a-lower-bounded, a-on-left)
          Some((a, b, aIsLowerBounded, sa))
        case _ => None
      }
    }
  }

  private def detect(j: Join, cond: Expression): Option[RangeShape] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // single-side conjuncts (inferred IsNotNull etc.) are harmless
    // residuals; ANY other cross-side shape (equality, OR, UDF...)
    // disqualifies
    val cross = conjuncts.filter(c =>
      !c.references.subsetOf(j.left.outputSet) &&
        !c.references.subsetOf(j.right.outputSet))
    if (cross.length != 2) return None
    val bounds = cross.map(c => asBound(c, j))
    if (bounds.exists(_.isEmpty)) return None
    val Seq((a1, b1, low1, left1), (a2, b2, low2, left2)) = bounds.flatten
    // the point expression appears in both conjuncts (canonicalized)
    def same(x: Expression, y: Expression) = x.canonicalized == y.canonicalized
    // orientations: point may be the a or the b of each comparison
    // (p >= lo, p <= hi) | (p >= lo, hi >= p) | (lo <= p, p <= hi) | ...
    val candidates = Seq(
      (a1, b1, low1, left1, a2, b2, low2),
      (a1, b1, low1, left1, b2, a2, !low2),
      (b1, a1, !low1, !left1, a2, b2, low2),
      (b1, a1, !low1, !left1, b2, a2, !low2))
    candidates.collectFirst {
      // p lower-bounded in one conjunct, upper-bounded in the other
      case (p1, bound1, isLow1, pLeft, p2, bound2, isLow2)
        if same(p1, p2) && isLow1 != isLow2 =>
        val (lo, hi) = if (isLow1) (bound1, bound2) else (bound2, bound1)
        RangeShape(p1, lo, hi, pLeft)
    }
  }

  private def rewrite(j: Join, cond: Expression, s: RangeShape, w: Long,
      maxBins: Long): LogicalPlan = {
    def toLong(e: Expression): Expression =
      if (e.dataType == LongType) e else Cast(e, LongType)
    def bin(e: Expression): Expression = IntegralDivide(toLong(e), Literal(w))

    val (intervalPlan, pointPlan) =
      if (s.pointOnLeft) (j.right, j.left) else (j.left, j.right)
    // interval side: one row per covered bin. NO explicit step: an
    // inverted interval (lo > hi — corrupt data the nested-loop plan
    // would simply not match) then yields a small DESCENDING sequence
    // the residual filters out, instead of Sequence's step-direction
    // error killing the query. The span guard is on the ABSOLUTE
    // difference — an inverted interval can be absurdly wide too — and
    // computed in DECIMAL so it stays EXACT for bins past 2^53 (doubles
    // would round a legitimate span across the threshold) while
    // opposite-sign extremes cannot overflow the way a Long subtraction
    // would. Wider than maxbins fails LOUDLY (same contract as
    // TemporalJoin.intervalJoin's guard) rather than silently
    // replicating one row millions of times.
    val dec = DecimalType(20, 0) // a Long fits; differences reach 21 digits
    val loBin = bin(s.lo)
    val hiBin = bin(s.hi)
    val span = Abs(Subtract(Cast(hiBin, dec), Cast(loBin, dec)))
    val guardedHi = If(
      GreaterThanOrEqual(span, Cast(Literal(maxBins), span.dataType)),
      // RaiseError is NullType and no coercion runs inside the optimizer —
      // cast it so both If branches agree (the cast never evaluates)
      Cast(RaiseError(Concat(Seq(
        Literal(UTF8String.fromString(
          s"range-join rewrite: interval spans more than $maxBins bins " +
            s"(raise $MaxBinsKey or $BinWidthKey): ")),
        Cast(s.lo, StringType), Literal(UTF8String.fromString(" .. ")),
        Cast(s.hi, StringType)))), LongType),
      hiBin)
    val binAttr = AttributeReference("_graft_bin", LongType, nullable = false)()
    val gen = Generate(
      // Sequence is TimeZoneAwareExpression — without an explicit zone it
      // stays unresolved and fails the optimizer's plan validation
      Explode(Sequence(loBin, guardedHi, None,
        Some(SQLConf.get.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(binAttr), child = intervalPlan)
    // point side: its single bin
    val pBin = Alias(bin(s.point), "_graft_bin_p")()
    val proj = Project(pointPlan.output :+ pBin, pointPlan)
    val newCond = And(EqualTo(binAttr, pBin.toAttribute), cond)
    val (nl, nr) = if (s.pointOnLeft) (proj, gen) else (gen, proj)
    Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
  }
}
