package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of the sessionizer's input stream. */
final case class SessionEvent(conv_id: String, ts: java.sql.Timestamp)

/** One closed session. */
final case class Session(conv_id: String, session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp, n_events: Long)

/** One session interval (open or gap-closed-but-unemitted). */
final case class SessState(startMs: Long, lastMs: Long, n: Long)

/** Carried sessionizer state for one conversation: every session that the
  * WATERMARK has not yet sealed — both gap-closed ones awaiting emission and
  * the trailing open one (kept unified: a late event can extend or bridge any
  * of them until the watermark passes its end + gap). */
final case class SessCarry(sessions: Seq[SessState])

/** Streaming analytics over the change stream (SURVEY §2.9 extensions):
  * watermarked windowed aggregation and gap-based sessionization with CUSTOM
  * state via `flatMapGroupsWithState` — late data handled by the watermark,
  * sessions closed by event-time timeout, state bounded to one small struct per
  * live conversation. Both operators run identically on batch DataFrames
  * (windowedCounts) or have an explicit batch twin (sessionizeBatch), which the
  * specs use to cross-check streaming output against the window-function
  * oracle of q_sessionize. */
object StreamAnalytics {

  /** Tumbling-window event counts per role with a watermark: the canonical
    * `readStream → withWatermark → window agg` shape. Works on batch input too
    * (the watermark is a no-op there). */
  def windowedCounts(events: DataFrame, windowDur: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("role"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"), col("role"), col("n_events"))

  /** Ingest-quality monitor: the text-analysis family as a watermarked
    * tumbling-window aggregation over the change stream — event volume,
    * delete/null-text share, average quality score, token volume per window.
    * Every metric is codegen'd column math ([[graft.functions.TextOps]]), so
    * the monitor adds zero shuffles beyond the window aggregation itself; a
    * dashboard over 100 TB/day of ingest pays one map-side-combined agg.
    * Works identically on batch input (the watermark is a no-op there) —
    * StreamSpec cross-checks the streaming output against the batch twin. */
  def qualityMonitor(events: DataFrame, windowDur: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame = {
    import graft.functions.TextOps
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_null_text"),
        round(avg(TextOps.qualityScore(col("text"))), 4).as("avg_quality"),
        sum(coalesce(TextOps.tokenCount(col("text")).cast("long"), lit(0L)))
          .as("n_tokens"))
      .select(col("window.start").as("w_start"), col("n_events"),
        col("n_null_text"), col("avg_quality"), col("n_tokens"))
  }

  /** STREAM-STREAM enrichment join: attach to each event of one stream the
    * row arriving on a SECOND stream for the same key within ±`joinWindow` of
    * its event time — left outer, so events whose enrichment never arrives
    * still emit (with nulls) once the watermark proves it cannot come. The
    * transcript-pipeline use: tool results / safety annotations / human labels
    * land on their own feed and must attach to the turn they describe without
    * replaying the table.
    *
    * Spark-native shape: watermark on BOTH inputs + an event-time range in
    * the join condition is exactly what bounds the join STATE — each side
    * buffers only rows younger than watermark + window, so state size tracks
    * rate × window, not stream history. Equality columns `keyCols` keep the
    * state-store keyed (no cross-key scan). The annotation side must not
    * reuse the left side's non-key column names (its key columns are dropped
    * from the output; everything else rides through).
    */
  def enrichWithinWindow(events: DataFrame, annotations: DataFrame,
                         keyCols: Seq[String], eventTime: String,
                         annTime: String, watermarkDelay: String = "10 minutes",
                         joinWindow: String = "5 minutes"): DataFrame = {
    val ev = events.withWatermark(eventTime, watermarkDelay)
    val ann = annotations.withWatermark(annTime, watermarkDelay)
    val keyCond = keyCols.map(k => ev(k) === ann(k)).reduce(_ && _)
    val timeCond =
      ann(annTime) >= ev(eventTime) - expr(s"INTERVAL $joinWindow") &&
        ann(annTime) <= ev(eventTime) + expr(s"INTERVAL $joinWindow")
    keyCols.foldLeft(ev.join(ann, keyCond && timeCond, "left_outer")) {
      (df, k) => df.drop(ann(k))
    }
  }

  /** Pure sessionization core: carried state + this batch's event times (ms) →
    * (closed sessions as (start, end, n), new open state). Deterministic:
    * events are processed in ascending time order; an out-of-order time that
    * still merges extends the session start backward (math.min). */
  def fold(times: Seq[Long], gapMs: Long, carried: Option[SessState])
      : (Seq[SessState], Option[SessState]) = {
    var cur = carried
    val closed = Seq.newBuilder[SessState]
    times.sorted.foreach { t =>
      cur match {
        case Some(s) if t - s.lastMs <= gapMs =>
          cur = Some(SessState(math.min(s.startMs, t), math.max(s.lastMs, t), s.n + 1))
        case Some(s) =>
          closed += s
          cur = Some(SessState(t, t, 1))
        case None =>
          cur = Some(SessState(t, t, 1))
      }
    }
    (closed.result(), cur)
  }

  /** Merge session intervals + new event times under the gap rule: sorted by
    * start, two intervals closer than `gapMs` fuse (a late event can BRIDGE
    * two previously separate sessions, so this is general interval merging,
    * not an append-only fold). */
  def mergeSessions(carried: Seq[SessState], times: Seq[Long],
                    gapMs: Long): Seq[SessState] = {
    val all = (carried ++ times.map(t => SessState(t, t, 1))).sortBy(s => (s.startMs, s.lastMs))
    all.foldLeft(Vector.empty[SessState]) { (acc, s) =>
      acc.lastOption match {
        case Some(p) if s.startMs - p.lastMs <= gapMs =>
          acc.init :+ SessState(p.startMs, math.max(p.lastMs, s.lastMs), p.n + s.n)
        case _ => acc :+ s
      }
    }
  }

  private def toSession(key: String, s: SessState): Session =
    Session(key, new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs), s.n)

  /** Streaming sessionizer: one small state struct per live conversation.
    * Sessions are emitted ONLY once the event-time watermark has passed
    * `session_end + gap` — a gap-closed session stays in state until then,
    * because a late event still inside the watermark may extend it (or bridge
    * it with a neighbor); emitting at gap-close time would let that late event
    * seed a spurious overlapping session. Append-mode output; emission order
    * per conversation is by session start. */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 watermark: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[SessCarry, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[SessionEvent], state: GroupState[SessCarry]) =>
          val carried = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val merged = mergeSessions(carried, rows.map(_.ts.getTime).toSeq, gapMs)
          // a session is sealed once NO admissible event (ts >= watermark, the
          // pre-filter guarantee) can merge with it: watermark > lastMs + gap
          val wm = state.getCurrentWatermarkMs()
          val (done, live) = merged.partition(s => wm > s.lastMs + gapMs)
          if (live.isEmpty) state.remove()
          else {
            state.update(SessCarry(live))
            // fire when the watermark passes the EARLIEST live session's seal
            // point (clamped: Spark requires the timeout to exceed the watermark)
            state.setTimeoutTimestamp(math.max(live.map(_.lastMs).min + gapMs, wm + 1))
          }
          done.sortBy(_.startMs).iterator.map(toSession(key, _))
      }
  }

  /** Batch twin of [[sessionize]]: same fold, trailing open session included
    * (batch input is complete, so the last session is closed by definition). */
  def sessionizeBatch(events: Dataset[SessionEvent], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.conv_id).flatMapGroups { (key, rows) =>
      val (closed, open) = fold(rows.map(_.ts.getTime).toSeq, gapMs, None)
      (closed ++ open).iterator.map(toSession(key, _))
    }
  }
}
