package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RANGE (interval-containment) JOIN — pair every point with every interval
  * containing it: `start <= p <= end`, with NO equi key connecting the sides.
  *
  * Spark compiles the naive `p BETWEEN start AND end` join condition to a
  * BroadcastNestedLoopJoin (or a cartesian product when neither side fits in
  * a broadcast) — O(|P|·|I|) comparisons. The scale path here is BINNING
  * (the brief's "compose existing ops" preference): choose a bin width W,
  * explode each interval into the bins it overlaps (⌈len/W⌉+1 rows), bin
  * each point once, hash EQUI-join on the bin id, then filter exact
  * containment. Work is O(|P| + |I|·span/W + matches) — pick W near the
  * typical interval length so the interval blow-up stays ~2× and each
  * point-bin meets only nearby intervals. Catalyst broadcasts the exploded
  * side when it is small; otherwise both sides shuffle on the bin id and AQE
  * skew-splits hot bins (a dense time region is the natural skew key).
  *
  * Works on any LONG domain (epoch days, epoch seconds, integer ids);
  * callers cast dates/timestamps first — keeping the operator unit-free.
  * Intervals with `end < start` match nothing (empty bins after the guard).
  *
  * Reference analog: the date-bound scans (SURVEY §2.2 P5) are the 1-interval
  * special case; the reference has no N-interval join because the RDBMS plans
  * its BETWEEN predicates per query.
  */
object RangeJoin {

  /** Inner join of `points` (carrying `pointCol: long`) with `intervals`
    * (carrying `startCol`/`endCol`: long) on containment, via bin equi-join.
    * Output columns: all point columns ++ all interval columns. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty,
      s"point/interval column names collide: $clash — alias them first")
    require(!(points.columns ++ intervals.columns).contains("_bin"),
      "inputs use the reserved internal column _bin")
    // EXACT integer floor division: floor(c / W) via `(c - pmod(c, W)) div W`.
    // The naive floor(col / W) promotes long/long to DOUBLE division, which
    // above 2^53 (epoch nanoseconds!) rounds bin ids and silently drops
    // matches. pmod is non-negative, so c - pmod(c, W) = W·⌊c/W⌋ exactly and
    // the integral `div` of that multiple is ⌊c/W⌋ for negatives too.
    def binOf(c: org.apache.spark.sql.Column) =
      call_function("div", c - pmod(c, lit(binWidth)), lit(binWidth))
    val binned = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("_bin", explode(sequence(
        binOf(col(startCol)), binOf(col(endCol)))))
    points
      .withColumn("_bin", binOf(col(pointCol)))
      .join(binned, "_bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bin")
  }

  /** INTERVAL-OVERLAP JOIN — pair every left interval with every right
    * interval it overlaps (`lStart <= rEnd && rStart <= lEnd`, closed ends),
    * again with no equi key. Same binning scheme as `pointInInterval`, with
    * the classic duplicate-elimination refinement: two overlapping intervals
    * share every bin from `bin(max(starts))` through `bin(min(ends))`, so the
    * joined pair would surface once per shared bin. Instead of a post-join
    * `distinct` (a second full shuffle of the matched pairs), each pair is
    * kept ONLY in its first shared bin — `_bin == bin(greatest(starts))`,
    * which both sides are guaranteed to cover because overlap means
    * `max(starts) <= min(ends)`, and which binOf's monotonicity turns into
    * `greatest(bin(lStart), bin(rStart))`. A map-side filter, no extra
    * shuffle, exact multiplicity. */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty,
      s"left/right column names collide: $clash — alias them first")
    require(!(left.columns ++ right.columns).contains("_bin"),
      "inputs use the reserved internal column _bin")
    def binOf(c: org.apache.spark.sql.Column) =
      call_function("div", c - pmod(c, lit(binWidth)), lit(binWidth))
    def explodeBins(df: DataFrame, s: String, e: String) = df
      .filter(col(e) >= col(s))
      .withColumn("_bin", explode(sequence(binOf(col(s)), binOf(col(e)))))
    explodeBins(left, lStart, lEnd)
      .join(explodeBins(right, rStart, rEnd), "_bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_bin") === greatest(binOf(col(lStart)), binOf(col(rStart))))
      .drop("_bin")
  }
}
