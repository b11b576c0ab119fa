package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via flatMapGroupsWithState: the
  * custom-state path Structured Streaming offers when windowed
  * aggregation can't express the semantics (variable-length sessions
  * closed by inactivity, not by wall-clock windows).
  *
  * State per user = (session start, last event ts, event count). An
  * event more than `gapMs` after the last one closes the open session
  * and emits it; processing-time timeout flushes sessions for users
  * that go silent. Batch equivalent: the gaps-and-islands query
  * (q25_sessionize) — same session definition.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Long, value: Double)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, start: Long, end: Long, n_events: Long)

  /** Sessions close when a later event arrives past the gap. (A
    * production deployment would add GroupStateTimeout to also flush
    * sessions of users that go permanently silent; with
    * ProcessingTimeTimeout every interval schedules a new micro-batch,
    * which keeps the stream permanently busy on a small test cluster —
    * so the default operator closes on data only.)
    */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          var closed = List.empty[Session]
          var cur = state.getOption
          rows.toSeq.sortBy(_.ts).foreach { e =>
            cur match {
              case Some(s) if e.ts - s.last > gapMs =>
                closed ::= Session(userId, s.start, s.last, s.n)
                cur = Some(SessionState(e.ts, e.ts, 1))
              case Some(s) =>
                cur = Some(SessionState(s.start, math.max(s.last, e.ts), s.n + 1))
              case None =>
                cur = Some(SessionState(e.ts, e.ts, 1))
            }
          }
          cur.foreach(state.update)
          closed.reverse.iterator
      }
  }
}
