package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/**
 * Temporal join operators the built-in Spark join strategies don't cover
 * without an all-pairs plan: as-of joins (latest right row at-or-before
 * each left row) and interval/point range joins (points matched to the
 * intervals containing them). Both are expressed as ONE key-partitioned
 * shuffle — a window pass for as-of, a bin equi-join for ranges — never a
 * cross join with a residual filter, which is what a naive
 * `left.join(right, leftTime >= rightTime)` plans (BroadcastNestedLoopJoin:
 * O(n*m) compares, the classic 100-TB scale-killer).
 *
 * Time columns may be timestamps (TZ or NTZ) or any numeric epoch — both
 * sides just need the same convention. Tolerances and bin widths are in
 * the column's own units (microseconds for timestamps).
 */
object TemporalJoin {

  /** Elapsed `a - b` in the time column's own units: microseconds for
    * timestamps (NTZ casts through the session TZ on BOTH operands, so
    * any shift cancels), the raw difference for numeric epochs. */
  private def timeDelta(a: Column, b: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType =>
      unix_micros(a.cast(TimestampType)) - unix_micros(b.cast(TimestampType))
    case _ => a - b
  }

  /** Epoch value in the column's own units, for binning. */
  private def epochValue(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType => unix_micros(c.cast(TimestampType))
    case _ => c
  }

  /**
   * As-of join: for every left row, the single right row with the largest
   * `rightTime <= leftTime` and equal join keys — pandas `merge_asof` /
   * kdb `aj` semantics. LEFT-join shaped: unmatched left rows keep null
   * right columns.
   *
   * Spark-first plan: instead of a per-left-row lookup (or an inequality
   * join, which Catalyst can only plan as a nested loop), both sides union
   * into one stream tagged left/right, shuffle ONCE on the key, sort by
   * (time, side, tiebreak), and a running `last(right_payload, ignoreNulls)`
   * window carries each right row forward to every later left row. One
   * exchange + one sort, both shared with the window — the same shape as
   * any `groupBy(key)` at scale; the right side never broadcasts and
   * neither side is enumerated pairwise.
   *
   * Ordering details that pin the semantics:
   *  - right rows sort BEFORE left rows at equal time, so `<=` holds;
   *  - ties among right rows at one time break by the LARGEST
   *    (time, tiebreakCols...) tuple — deterministic under retries, and
   *    expressible in an oracle as `row_number() OVER (ORDER BY time DESC,
   *    tiebreak DESC) = 1`;
   *  - `tolerance` (optional, in the time column's units) voids matches
   *    older than `leftTime - tolerance` — pandas' `tolerance=` contract.
   *
   * Skew: one hot key lands in one task, like any keyed window. For a key
   * whose history exceeds a task, pre-split the right side by coarse time
   * range and union the per-range results (the operator itself stays
   * skew-neutral; salting would break the running carry-forward).
   *
   * Output: every left column, plus each `rightCols` value as
   * `<prefix><col>` (null when no right row qualifies).
   */
  def asofJoin(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTimeCol: String, rightTimeCol: String,
      rightCols: Seq[String], tiebreakCols: Seq[String] = Nil,
      prefix: String = "asof_", tolerance: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one equi-key column")
    require(rightCols.nonEmpty, "asofJoin needs right columns to carry")
    val leftCols = left.columns.toSeq
    val reserved = Seq("_side", "_asof_t", "_r", "_m")
    require(!leftCols.exists(reserved.contains),
      s"left side may not contain reserved columns ${reserved.mkString("/")}")
    // the carried payload leads with (time, tiebreaks) so Spark's struct
    // ordering — lexicographic by field — makes "largest struct" mean
    // "latest right row, ties broken by the tiebreak columns"
    val payloadFields =
      (col(rightTimeCol).as("_t") +: tiebreakCols.map(c => col(c).as(s"_tb_$c"))) ++
        rightCols.map(c => col(c).as(c))
    // a null right time can never be "at or before" anything — but it
    // would sort nulls-FIRST in the window and its payload would carry
    // forward as a phantom match; drop such rows up front (the oracle's
    // inequality formulation is null-safe false for them)
    val rightTagged = right.filter(col(rightTimeCol).isNotNull).select(
      keyCols.map(col) ++ Seq(
        col(rightTimeCol).as("_asof_t"),
        lit(0).as("_side"),
        struct(payloadFields: _*).as("_r")): _*)
    val leftTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTimeCol).as("_asof_t"),
        lit(1).as("_side"),
        lit(null).cast(rightTagged.schema("_r").dataType).as("_r")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    // right rows carry no left payload columns; null-fill so the union lines up
    val rightAligned = rightTagged.select(
      leftTagged.columns.map { c =>
        if (rightTagged.columns.contains(c)) col(c)
        else lit(null).cast(leftTagged.schema(c).dataType).as(c)
      }: _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_asof_t").asc, col("_side").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = leftTagged.unionByName(rightAligned)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val timeType = matched.schema("_asof_t").dataType
    val withTol = tolerance match {
      case Some(tol) => matched.withColumn("_m",
        when(col("_m").isNotNull &&
          timeDelta(col("_asof_t"), col("_m._t"), timeType) <= tol,
          col("_m")))
      case None => matched
    }
    withTol.select(
      leftCols.map(col) ++
        rightCols.map(c => col(s"_m.$c").as(s"$prefix$c")): _*)
  }

  /**
   * Interval/point range join: every (interval, point) pair with
   * `start <= t <= end` and equal `keyCols` (which may be empty — the pure
   * range join Spark would otherwise nested-loop). Inner-join shaped;
   * callers aggregate or anti-join as needed. Point-side key columns are
   * dropped from the output (they equal the interval side's); all other
   * column names must be disjoint — rename before joining a table to
   * intervals derived from itself.
   *
   * Plan: time is cut into fixed `binWidth` bins (time-column units). A
   * point lives in exactly one bin; an interval covers each bin it
   * overlaps. Equi-join on (bin, keys...) + the exact residual predicate
   * finds every pair exactly once — a point matches an interval only in
   * the point's own bin, so no distinct pass is needed. Shuffle volume is
   * points + interval-replicas (span/bin + 1 per interval),
   * hash-partitioned on the bin: a pure range join distributes across the
   * cluster instead of broadcasting or nested-looping anything.
   *
   * Pick `binWidth` near the typical interval span: much smaller bins
   * replicate intervals; much larger bins put unrelated rows in one bin
   * and push work onto the residual. `maxBinsPerInterval` fails LOUDLY on
   * an interval that would fan out absurdly (a corrupt end date
   * replicating one row a million times) instead of silently flooding
   * the shuffle.
   */
  def intervalJoin(intervals: DataFrame, points: DataFrame,
      startCol: String, endCol: String, timeCol: String,
      keyCols: Seq[String] = Nil, binWidth: Long,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val startType = intervals.schema(startCol).dataType
    val endType = intervals.schema(endCol).dataType
    val pointType = points.schema(timeCol).dataType
    val loBin = floor(epochValue(col(startCol), startType) / binWidth)
    val hiBin = floor(epochValue(col(endCol), endType) / binWidth)
    val guarded = intervals
      .withColumn("_lo", loBin).withColumn("_hi", hiBin)
      // guard the ABSOLUTE span in decimal: an inverted interval (corrupt
      // end < start — matches nothing via the residual) can be absurdly
      // wide too, and sequence() would default-step DOWN through it;
      // decimal keeps the check EXACT for bins past 2^53 (doubles round)
      // and opposite-sign extremes cannot overflow the subtraction
      .withColumn("_hi", when(
        abs(col("_hi").cast("decimal(20,0)") - col("_lo").cast("decimal(20,0)")) >=
          lit(maxBinsPerInterval),
        raise_error(concat(lit(s"interval spans more than $maxBinsPerInterval bins: "),
          col(startCol).cast("string"), lit(" .. "), col(endCol).cast("string"))))
        .otherwise(col("_hi")))
      .withColumn("_bin", explode(sequence(col("_lo"), col("_hi"))))
      .drop("_lo", "_hi")
    val binnedPoints = points.withColumn("_bin",
      floor(epochValue(col(timeCol), pointType) / binWidth))
    val joinCond = (keyCols.map(k => guarded(k) === binnedPoints(k)) :+
      (guarded("_bin") === binnedPoints("_bin")) :+
      (binnedPoints(timeCol) >= guarded(startCol)) :+
      (binnedPoints(timeCol) <= guarded(endCol))).reduce(_ && _)
    val joined = guarded.join(binnedPoints, joinCond)
    keyCols.foldLeft(joined)((d, k) => d.drop(binnedPoints(k)))
      .drop(guarded("_bin")).drop(binnedPoints("_bin"))
  }
}
