package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of the sessionizer's input stream. */
final case class SessionEvent(conv_id: String, ts: java.sql.Timestamp)

/** One closed session. */
final case class Session(conv_id: String, session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp, n_events: Long)

/** Carried sessionizer state for one conversation. */
final case class SessState(startMs: Long, lastMs: Long, n: Long)

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

  /** Pure sessionization core: carried state + this batch's event times (ms) →
    * (closed sessions as (start, end, n), new open state). Deterministic:
    * events are processed in ascending time order. */
  def fold(times: Seq[Long], gapMs: Long, carried: Option[SessState])
      : (Seq[SessState], Option[SessState]) = {
    var cur = carried
    val closed = Seq.newBuilder[SessState]
    times.sorted.foreach { t =>
      cur match {
        case Some(s) if t - s.lastMs <= gapMs =>
          cur = Some(SessState(s.startMs, math.max(s.lastMs, t), s.n + 1))
        case Some(s) =>
          closed += s
          cur = Some(SessState(t, t, 1))
        case None =>
          cur = Some(SessState(t, t, 1))
      }
    }
    (closed.result(), cur)
  }

  private def toSession(key: String, s: SessState): Session =
    Session(key, new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs), s.n)

  /** Streaming sessionizer: one state struct per live conversation, sessions
    * emitted when the gap closes them mid-batch or when the event-time timeout
    * fires (watermark passed session_end + gap). Append-mode output. */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 watermark: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[SessionEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(toSession(key, s))
          } else {
            val (closed, open) = fold(rows.map(_.ts.getTime).toSeq, gapMs, state.getOption)
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.iterator.map(toSession(key, _))
          }
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
