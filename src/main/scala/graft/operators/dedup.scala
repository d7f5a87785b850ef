package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Last-writer-wins deduplication: one surviving change event per key, the one with
  * the maximum LSN.
  *
  * Reference semantics: the merge procedures resolve "new, changed, and logically
  * deleted records" per key (reference dest/I2b2QueryResultsHandler.java:112-153) and
  * the max-UPDATE_DATE pattern picks the latest writer
  * (reference dest/table/ProviderDimensionFactory.java:153-183).
  *
  * Implementation: `max(struct(lsn, payload…))` hash aggregation rather than a
  * `row_number()` window. The window form forces a full shuffle + per-partition sort
  * of EVERY event; the aggregate form is partial-aggregable (map-side combine), so a
  * key with 10^6 duplicate events is reduced to one row per map task BEFORE the
  * shuffle — at 100 TB that is the difference between shuffling the whole stream and
  * shuffling ~|keys| rows. The struct comparison is lexicographic with `lsn` first,
  * so duplicate-LSN redelivery (same payload) resolves deterministically.
  */
object Dedup {

  /** One row per key with all original columns, plus `n_events` (how many raw events
    * collapsed into this key — `n_events - 1` is the conflict count for lineage). */
  def lww(df: DataFrame, keyCols: Seq[String] = Seq("conv_id", "turn_idx"),
          lsnCol: String = "lsn"): DataFrame = {
    val valueCols = df.columns.filterNot(keyCols.contains).toSeq
    val ordered = struct((lsnCol +: valueCols.filterNot(_ == lsnCol)).map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max(ordered).as("_w"), count(lit(1)).as("n_events"), min(col(lsnCol)).as("_lsn_min"))
      .select(keyCols.map(col) ++ valueCols.map(c => col(s"_w.$c").as(c))
        :+ col("n_events") :+ col("_lsn_min"): _*)
  }

  /** Two-phase LWW with FIXED-WIDTH aggregation buffers (round-5 experiment,
    * VERDICT r04 #8): `max(struct(lsn, payload…))` carries the string payload
    * through the aggregation buffer, which pushes Spark off HashAggregate
    * (non-primitive buffers → ObjectHashAggregate/SortAggregate). This variant
    * aggregates `max(lsn)` per key first (primitive buffer, map-side combine,
    * whole-stage codegen), then joins the winning (key, maxLsn) back to the
    * raw events to fetch the payload; a final tiny max(struct) over the ~1-row
    * -per-key survivors resolves duplicate-LSN redelivery ties exactly like
    * [[lww]]. Trade-off being measured: the join re-shuffles the FULL payload
    * stream on the keys (no map-side combine of duplicates), but every
    * aggregate on the hot path is hash-based. Output is column-identical to
    * [[lww]]. Select per-session via `spark.graft.dedup.strategy=twophase`
    * (see CdcMerge); the winner of the measured comparison rides BASELINE.md. */
  /** `joinSide`: a metrics-free TWIN of `df` for the join-back branch. The
    * two-phase plan scans the input twice (aggregate + join); if `df` carries
    * an `observe()`, the duplicated CollectMetrics node would double-count its
    * metrics (the Observation-resolution bug class caught in round 4). Pass
    * the same data WITHOUT the observation; the aggregate branch — which scans
    * every row exactly once — keeps the observed frame so the metrics resolve
    * with this plan's action. */
  def lwwTwoPhase(df: DataFrame, keyCols: Seq[String] = Seq("conv_id", "turn_idx"),
                  lsnCol: String = "lsn",
                  joinSide: Option[DataFrame] = None): DataFrame = {
    val valueCols = df.columns.filterNot(keyCols.contains).toSeq
    val ordered = struct((lsnCol +: valueCols.filterNot(_ == lsnCol)).map(col): _*)
    val winners = df.groupBy(keyCols.map(col): _*)
      .agg(max(col(lsnCol)).as("_maxlsn"), count(lit(1)).as("n_events"),
        min(col(lsnCol)).as("_lsn_min"))
    joinSide.getOrElse(df).join(winners, keyCols)
      .filter(col(lsnCol) === col("_maxlsn"))
      .groupBy(keyCols.map(col): _*)
      .agg(max(ordered).as("_w"), max("n_events").as("n_events"),
        min("_lsn_min").as("_lsn_min")) // constant within the group either way
      .select(keyCols.map(col) ++ valueCols.map(c => col(s"_w.$c").as(c))
        :+ col("n_events") :+ col("_lsn_min"): _*)
  }

  /** Explicitly salted two-phase LWW (north rule: "salts hot conv_id keys before the
    * key-partitioned shuffle"). Phase 1 aggregates on (key, salt) — a hot key's
    * events spread over `saltBuckets` reducers — phase 2 reduces the ≤saltBuckets
    * survivors per key. Spark's partial aggregation already absorbs most skew
    * map-side; the explicit salt additionally protects the reduce side when partial
    * aggregation degrades (high map-side key cardinality → hash-map spill).
    */
  def lwwSalted(df: DataFrame, keyCols: Seq[String] = Seq("conv_id", "turn_idx"),
                lsnCol: String = "lsn", saltBuckets: Int = 16): DataFrame = {
    val valueCols = df.columns.filterNot(keyCols.contains).toSeq
    val ordered = struct((lsnCol +: valueCols.filterNot(_ == lsnCol)).map(col): _*)
    val salt = pmod(xxhash64(col(lsnCol)), lit(saltBuckets)).as("_salt")
    val phase1 = df.groupBy((keyCols.map(col) :+ salt): _*)
      .agg(max(ordered).as("_w"), count(lit(1)).as("n_events"), min(col(lsnCol)).as("_lsn_min"))
    phase1.groupBy(keyCols.map(col): _*)
      .agg(max(col("_w")).as("_w"), sum("n_events").as("n_events"),
        min("_lsn_min").as("_lsn_min"))
      .select(keyCols.map(col) ++ valueCols.map(c => col(s"_w.$c").as(c))
        :+ col("n_events") :+ col("_lsn_min"): _*)
  }
}

/** Hot-key detection for choosing the salted path.
  * Reference analog: none (single-node JDBC has no shuffle skew); north-rule-new. */
object Skew {
  /** Approximate share of the most frequent value of `keyCol`.
    *
    * Sampled with `df.sample(fraction)` — NOT `limit(n)`, which takes the FIRST
    * partitions (= the first files of the batch) and is blind to a hot key
    * concentrated in later files. `sample` draws from every partition. If the
    * sample turns out tiny (< `minSample` rows, i.e. the batch itself is small),
    * fall back to an exact count over the full batch — cheap by construction.
    * One column is scanned either way. */
  def topKeyShare(df: DataFrame, keyCol: String, fraction: Double = 0.05,
                  minSample: Long = 1000L): Double = {
    def share(d: DataFrame): (Double, Long) = {
      val s = d.groupBy(keyCol).count()
        .agg(max("count").as("mx"), sum("count").as("tot"))
        .collect()(0)
      if (s.isNullAt(1) || s.getLong(1) == 0L) (0.0, 0L)
      else (s.getLong(0).toDouble / s.getLong(1).toDouble, s.getLong(1))
    }
    val (approx, sampled) = share(df.select(keyCol).sample(fraction, 42L))
    if (sampled >= minSample) approx
    else share(df.select(keyCol))._1 // batch < minSample/fraction rows: exact is cheap
  }
}
