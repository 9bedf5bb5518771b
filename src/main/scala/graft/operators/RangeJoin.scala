package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a cross product.
  *
  * "Which points fall inside which [start, end) intervals" is a
  * non-equi join; Spark's planner turns it into a broadcast
  * nested-loop or a sort-merge with a buffered range probe, both of
  * which degrade to O(|P|x|I|) work per key under overlap. The
  * standard scale-out shape (used by every distributed geo/temporal
  * engine) is binning:
  *
  *   - each point keys to the single fixed-width bin its time falls in
  *   - each interval explodes to every bin it overlaps
  *   - equi-join on (key…, bin), then the exact containment filter
  *
  * Each qualifying (point, interval) pair meets in EXACTLY one bin —
  * the point's — so no post-join dedup is needed. Cost: one keyed
  * shuffle of points, one of (intervals x binsSpanned). With binMicros
  * chosen >= the typical interval width, binsSpanned <= 2 and the
  * explode is a constant factor, never a product. An interval spanning
  * `maxBins` (default 8192) or more bins fails fast with an actionable
  * error — an open-ended sentinel end date ('9999-12-31') must not
  * silently explode to tens of millions of rows (the same guard
  * [[graft.plans.RangeJoinRule]] applies on the optimizer path).
  */
object RangeJoin {

  /** Bins one interval may span before the explode fails fast. */
  val MaxBins = 8192L

  /** Backtick-quoted identifier: column names are spliced into SQL
    * strings and `col()` paths, where an unquoted `a-b` would parse
    * as a subtraction and a dotted name as a struct access. */
  private def q(n: String): String = "`" + n.replace("`", "``") + "`"

  /** Floor division (SQL `div` truncates toward zero, which would
    * mis-bin pre-epoch timestamps). Shared by both operators — binning
    * MUST agree between them. */
  private def binOf(micros: String, binMicros: Long): String =
    s"(($micros) div $binMicros) - " +
      s"(CASE WHEN ($micros) % $binMicros < 0 THEN 1 ELSE 0 END)"

  /** Epoch micros tolerant of TIMESTAMP_NTZ inputs: unix_micros only
    * accepts TIMESTAMP, and the cast is an identity for it (for NTZ it
    * resolves through the session timezone — pinned UTC engine-wide). */
  private def microsOf(tsCol: String): String =
    s"unix_micros(CAST($tsCol AS TIMESTAMP))"

  private def reserveBin(df: DataFrame, what: String): Unit =
    require(!df.columns.contains("_bin"),
      s"$what frame already has a column named _bin " +
        "(reserved by RangeJoin); rename it")

  /** Drop empty/inverted intervals and explode each survivor to every
    * bin `[st, en)` overlaps — capped at [[MaxBins]] per interval. */
  private def explodeBins(df: DataFrame, st: String, en: String,
                          binMicros: Long): DataFrame = {
    val startBin = expr(binOf(microsOf(q(st)), binMicros))
    val endBin = expr(binOf(microsOf(q(en)) + " - 1", binMicros))
    // span >= cap fails fast; span < 0 here can only mean the micros
    // subtraction wrapped on a sentinel bound (the interval filter
    // already dropped genuinely inverted rows) — without the check
    // the wrap would BYPASS the cap (the RangeJoinRule guard, mirrored)
    val span = endBin - startBin
    val guardedEnd = when(span >= lit(MaxBins) || span < lit(0L),
      expr("CAST(raise_error('graft range join: an interval spans " +
        s"$MaxBins bins or more; raise binMicros or split the " +
        "sentinel interval') AS BIGINT)"))
      .otherwise(endBin)
    df.filter(col(en) > col(st))
      .withColumn("_bin", explode(sequence(startBin, guardedEnd)))
  }

  private def requireDisjoint(left: DataFrame, rightOut: Seq[String],
                              what: String): Unit = {
    val collisions = left.columns.toSet.intersect(rightOut.toSet)
    require(collisions.isEmpty,
      s"rename $what columns colliding: ${collisions.mkString(",")}")
  }

  /** @param points     frame with a timestamp column `pointTime`
    * @param intervals  frame with `[startCol, endCol)` timestamps;
    *                   empty or inverted intervals are dropped
    * @param keyCols    equality columns present on BOTH frames (the
    *                   interval copies are dropped from the output);
    *                   may be empty for a pure temporal join
    * @param binMicros  bin width in microseconds; pick the typical
    *                   interval width (an interval spanning k bins
    *                   costs k shuffled copies — linear, but worth
    *                   keeping small)
    * @return points columns + interval columns (minus duplicate keys),
    *         one row per (point, containing interval) pair
    */
  def pointInInterval(points: DataFrame, pointTime: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      keyCols: Seq[String], binMicros: Long): DataFrame = {
    require(binMicros > 0, "binMicros must be positive")
    reserveBin(points, "points"); reserveBin(intervals, "intervals")
    val ivOut = intervals.columns.filterNot(keyCols.contains)
    requireDisjoint(points, ivOut, "interval")
    val p = points
      .withColumn("_bin",
        expr(binOf(microsOf(q(pointTime)), binMicros)))
      .as("p")
    val i = explodeBins(intervals, startCol, endCol, binMicros).as("i")
    val cond = (keyCols.map(k => col(s"p.${q(k)}") === col(s"i.${q(k)}")) :+
      (col("p._bin") === col("i._bin")) :+
      (col(s"p.${q(pointTime)}") >= col(s"i.${q(startCol)}")) :+
      (col(s"p.${q(pointTime)}") < col(s"i.${q(endCol)}"))).reduce(_ && _)
    p.join(i, cond)
      .select(points.columns.map(n => col(s"p.${q(n)}").as(n)) ++
        ivOut.map(n => col(s"i.${q(n)}").as(n)): _*)
  }

  /** Interval-overlap join: one row per (left, right) interval pair
    * with `[aStart,aEnd) ∩ [bStart,bEnd) ≠ ∅` (and equal keys). Same
    * binning as [[pointInInterval]], except both sides explode; an
    * overlapping pair now meets in EVERY shared bin, so the join keeps
    * only the bin containing `max(aStart, bStart)` — each pair
    * qualifies in exactly one bin again, no dedup shuffle. */
  def intervalOverlap(left: DataFrame, aStart: String, aEnd: String,
                      right: DataFrame, bStart: String, bEnd: String,
                      keyCols: Seq[String], binMicros: Long): DataFrame = {
    require(binMicros > 0, "binMicros must be positive")
    reserveBin(left, "left"); reserveBin(right, "right")
    val rightOut = right.columns.filterNot(keyCols.contains)
    requireDisjoint(left, rightOut, "right")
    val a = explodeBins(left, aStart, aEnd, binMicros).as("a")
    val b = explodeBins(right, bStart, bEnd, binMicros).as("b")
    val anchor = expr(binOf(
      s"greatest(${microsOf(s"a.${q(aStart)}")}, " +
        s"${microsOf(s"b.${q(bStart)}")})",
      binMicros))
    val cond = (keyCols.map(k => col(s"a.${q(k)}") === col(s"b.${q(k)}")) :+
      (col("a._bin") === col("b._bin")) :+
      (col(s"a.${q(aStart)}") < col(s"b.${q(bEnd)}")) :+
      (col(s"b.${q(bStart)}") < col(s"a.${q(aEnd)}")) :+
      (col("a._bin") === anchor)).reduce(_ && _)
    a.join(b, cond)
      .select(left.columns.map(n => col(s"a.${q(n)}").as(n)) ++
        rightOut.map(n => col(s"b.${q(n)}").as(n)): _*)
  }
}
