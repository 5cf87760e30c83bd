package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via `flatMapGroupsWithState` — the
  * explicit-state alternative to `session_window` for session logic the
  * built-in operator can't express (per-session event caps, custom emit
  * conditions, enrichment of the closing event).
  *
  * State per user: the open session (start, last event, count). An event
  * beyond `gapMillis` of the previous one closes the session (emitted
  * downstream) and opens a new one; a processing-time timeout flushes idle
  * sessions. Scale posture: state is O(users), partitioned by the grouping
  * key — the standard Structured Streaming stateful-operator shape.
  */
object StreamingSessions {

  final case class Event(user_id: Long, ts: Timestamp)

  final case class SessionState(
      start: Long,
      lastTs: Long,
      nEvents: Long)

  final case class ClosedSession(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long)

  def sessionize(
      events: Dataset[Event],
      gapMillis: Long,
      idleTimeoutMillis: Option[Long] = None): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    // ProcessingTimeTimeout keeps the micro-batch engine cycling to check
    // timers (processAllAvailable never quiesces in tests); default to
    // NoTimeout and let callers opt in to idle flushing
    val timeoutConf =
      if (idleTimeoutMillis.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    def flush(userId: Long, st: SessionState): ClosedSession =
      ClosedSession(
        userId,
        new Timestamp(st.start),
        new Timestamp(st.lastTs),
        st.nEvents)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(),
        timeoutConf)(
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val out = state.getOption.map(flush(userId, _))
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var current = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              current match {
                case Some(st) if t - st.lastTs <= gapMillis =>
                  // cross-batch out-of-order event: never move the session
                  // end backwards below an already-observed event
                  current = Some(st.copy(
                    lastTs = math.max(st.lastTs, t),
                    nEvents = st.nEvents + 1))
                case Some(st) =>
                  closed += flush(userId, st)
                  current = Some(SessionState(t, t, 1))
                case None =>
                  current = Some(SessionState(t, t, 1))
              }
            }
            current match {
              case Some(st) =>
                state.update(st)
                idleTimeoutMillis.foreach(state.setTimeoutDuration)
              case None => state.remove()
            }
            closed.iterator
          }
        })
  }
}
