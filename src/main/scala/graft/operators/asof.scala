package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LEFT AS-OF JOIN — for each left row, the single most recent right row with
  * `rightTime <= leftTime` on the same key (inclusive), or nulls if none.
  *
  * Spark has no ASOF JOIN operator (DuckDB, Pandas and kdb do); the naive
  * encodings are a range theta-join (O(|L|·|R|) per key, BNLJ at scale) or a
  * per-left-row correlated subquery. This follows the brief's preference
  * order — COMPOSE existing operators before writing a custom SparkPlan:
  * union both sides tagged, ONE shuffle on the key, one in-partition sort,
  * and a `last(..., ignoreNulls)` running window carries the latest right
  * payload forward onto every left row. Cost is sort-merge-like:
  * shuffle |L|+|R| rows once, no pair explosion, AQE skew handling applies
  * to the single exchange.
  *
  * The right payload rides as ONE struct so the carried value is the latest
  * right ROW in its entirety — a null FIELD inside that row stays null
  * instead of leaking an older non-null value (the bug a per-column
  * `last(c, ignoreNulls)` would have).
  *
  * Ties: a right row at exactly `leftTime` IS matched (side ordering puts
  * right before left at equal timestamps) — the same inclusive `l.ts >= r.ts`
  * semantics as DuckDB's `ASOF LEFT JOIN`. Right rows with a NULL
  * `rightTime` are excluded (no position on the timeline). `right` must be
  * unique per (keyCols, rightTime); pre-aggregate it otherwise (equal-time
  * right rows have no defined "latest") — set
  * `spark.graft.asof.checkUnique=true` to have the operator assert this
  * loudly (debug mode; costs one extra aggregation over the right side).
  *
  * CDC relevance: "state as of this event's time" is the temporal lookup a
  * transcript pipeline needs to join events against the latest prior
  * snapshot/annotation without replaying (the reference resolves the analog
  * — latest record by max UPDATE_DATE — only at whole-table grain,
  * reference dest/table/ProviderDimensionFactory.java:153-183).
  */
object AsofJoin {

  /** Backward as-of (the default): latest right row with `rightTime <= leftTime`. */
  def leftAsof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String): DataFrame =
    asofImpl(left, right, keyCols, leftTime, rightTime, forward = false)

  /** FORWARD as-of: the EARLIEST right row with `rightTime >= leftTime`
    * (inclusive), or nulls if none — "the next reading at-or-after this
    * event". Same single-shuffle composition with the sort order reversed:
    * in descending time order, the running `last` right row seen at-or-before
    * a left row is exactly the smallest rightTime >= leftTime. DuckDB mirrors
    * it as `ASOF LEFT JOIN ... ON l.ts <= r.ts`. */
  def leftAsofForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                      leftTime: String, rightTime: String): DataFrame =
    asofImpl(left, right, keyCols, leftTime, rightTime, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                       leftTime: String, rightTime: String,
                       forward: Boolean): DataFrame = {
    require(keyCols.nonEmpty, "asof join needs at least one key column")
    val payload = right.columns.toSeq
      .filterNot(c => keyCols.contains(c) || c == rightTime)
    require(payload.nonEmpty, "right side carries no payload columns")
    val clash = payload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"right payload columns collide with left columns: $clash — alias them first")
    val reserved = Set("_t", "_side", "_rpay", "_asof")
    val taken = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(taken.isEmpty, s"inputs use reserved internal columns: $taken")
    // a NULL right timestamp has no place on the timeline: NULLs sort first
    // in the window order and would be carried onto every left row as if the
    // row occurred at -infinity — exclude them, matching DuckDB's ASOF
    // semantics (rightTime <= leftTime is UNKNOWN for NULL)
    val rightClean = right.filter(col(rightTime).isNotNull)
    // debug-mode guard for the uniqueness precondition above: fail LOUDLY on
    // duplicate (key, time) right rows instead of silently picking a
    // struct-max. An extra full aggregation over the right side — opt-in via
    // conf, not the production path.
    if (right.sparkSession.conf.get("spark.graft.asof.checkUnique", "false").toBoolean) {
      val dups = rightClean
        .groupBy((keyCols :+ rightTime).map(col): _*).count()
        .filter(col("count") > 1).limit(5)
        .collect()
      require(dups.isEmpty,
        s"asof right side is not unique per (${keyCols.mkString(",")}, $rightTime): " +
          s"e.g. ${dups.toSeq.take(3).mkString("; ")} — pre-aggregate it first")
    }
    val rTagged = rightClean.select(
      keyCols.map(col) ++ Seq(col(rightTime).as("_t"), lit(0).as("_side"),
        struct(payload.map(col): _*).as("_rpay")): _*)
    val lTagged = left.select(
      left.columns.map(col).toSeq ++ Seq(col(leftTime).as("_t"), lit(1).as("_side"),
        lit(null).cast(rTagged.schema("_rpay").dataType).as("_rpay")): _*)
    // right rows null-fill the left-only columns; dropped by the side filter
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // ties: right (_side=0) sorts before left at equal _t in EITHER direction,
    // so a right row exactly at leftTime is matched inclusively both ways
    // forward branch orders desc NULLS FIRST: Spark's plain desc is NULLS
    // LAST, which would sort a null-_t left row after every right row and
    // hand it the EARLIEST right payload (as if it occurred at -infinity) —
    // contradicting the backward form (asc = NULLS FIRST, null left rows see
    // an empty prefix) and DuckDB ASOF (l.ts <= r.ts is UNKNOWN for NULL).
    // Right rows are already non-null-filtered, so nulls-first affects left
    // rows only: they see no prior right row and get null payloads.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(if (forward) col("_t").desc_nulls_first else col("_t").asc, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(col).toSeq ++
        payload.map(c => col(s"_asof.$c").as(c)): _*)
  }
}
