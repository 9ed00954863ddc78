package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization with custom state
  * (`flatMapGroupsWithState`) — the stateful-operator surface of the
  * engine (SURVEY §2.9; the reference has no session concept, its only
  * state is the ingest queue). Batch counterpart: `ops.RelOps.sessionize`.
  *
  * State per key is ONE open session (constant size — bounded state at
  * any key cardinality); a processing-time timeout flushes sessions
  * whose key goes quiet, so state can't accumulate unboundedly even for
  * keys that stop sending. Events later than the open session's end
  * extend it or close it and open the next; a closed session is emitted
  * exactly once.
  */
object StreamingSessions {

  case class Event(key: String, sec: Long)
  case class OpenSession(start: Long, end: Long, n: Long)
  case class Session(key: String, start_sec: Long, end_sec: Long, n_events: Long, closed_by: String)

  /** Fold a micro-batch of events into the per-key open session,
    * emitting every session that closed. Visible for unit tests.
    * `timeoutMs <= 0` disables the processing-time timeout (required
    * when the query runs with `GroupStateTimeout.NoTimeout`).
    */
  def step(key: String, events: Iterator[Event], state: GroupState[OpenSession],
           gapSeconds: Long, timeoutMs: Long): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(Session(key, s.start, s.end, s.n, "timeout"))
    } else {
      val sorted = events.map(_.sec).toArray.sorted
      var open = state.getOption
      val closed = Iterator.newBuilder[Session]
      sorted.foreach { t =>
        open match {
          case Some(s) if t - s.end <= gapSeconds =>
            // events can arrive at or before the open end (same-second or
            // intra-batch duplicates); never shrink the session
            open = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1))
          case Some(s) =>
            closed += Session(key, s.start, s.end, s.n, "gap")
            open = Some(OpenSession(t, t, 1))
          case None =>
            open = Some(OpenSession(t, t, 1))
        }
      }
      open.foreach { s =>
        state.update(s)
        if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
      }
      closed.result()
    }
  }

  /** Wire the stateful operator over an Event stream. Output mode must
    * be append (sessions emit once, on close).
    *
    * `timeoutMs > 0` (production default) arms a processing-time
    * timeout that flushes sessions of keys that go quiet. NOTE: with a
    * timeout armed, Spark schedules timeout-check batches continuously,
    * so `processAllAvailable()` never quiesces — in tests (and any
    * drain-and-assert harness) pass `timeoutMs = 0` to run with
    * `NoTimeout`, where sessions close only via the gap rule.
    */
  def sessions(events: Dataset[Event], gapSeconds: Long = 1800L,
               timeoutMs: Long = 60000L): Dataset[Session] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (key: String, it: Iterator[Event], state: GroupState[OpenSession]) =>
          step(key, it, state, gapSeconds, timeoutMs))
  }
}
