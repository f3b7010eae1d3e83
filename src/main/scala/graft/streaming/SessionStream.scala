package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event for sessionization. `ts` stays a timestamp so the
  * source's watermark column flows into the stateful operator (event-time
  * timeout requires it).
  */
case class SessionEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Double)

/** One emitted session. */
case class SessionRow(user_id: Long, session_idx: Long, start_micros: Long,
    end_micros: Long, n_events: Long, session_value: Double)

/** Open-session state carried between micro-batches. */
case class SessionAcc(idx: Long, start: Long, end: Long, n: Long, value: Double)

/** Stateful sessionization via flatMapGroupsWithState (SURVEY §2j) — the
  * streaming twin of the oracled batch query `etl_sessionize` (30-minute
  * gap). Works on batch Datasets too (each group arrives once, state
  * empty), which is how the spec proves batch/stream equivalence.
  *
  * Scale notes: state is one [[SessionAcc]] per ACTIVE user — ∝ users,
  * not events; event-time timeout closes idle sessions so state can't
  * grow unboundedly.
  */
object SessionStream {

  val GapMicros: Long = 30L * 60 * 1000000

  private def micros(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L

  /** Process one user's (unordered) new events against open-session state,
    * emitting every closed session; the trailing open session stays in
    * state (streaming) or is flushed (`flushOpen`, batch mode).
    */
  private def processGroup(userId: Long, events: Iterator[SessionEvent],
      state: GroupState[SessionAcc], flushOpen: Boolean): Iterator[SessionRow] = {
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    if (sorted.isEmpty) {
      if (state.hasTimedOut && state.exists) {
        val a = state.get
        state.remove()
        return Iterator(SessionRow(userId, a.idx, a.start, a.end, a.n, a.value))
      }
      return Iterator.empty
    }
    val out = Seq.newBuilder[SessionRow]
    var acc = state.getOption.orNull
    for (e <- sorted) {
      val t = micros(e.ts)
      if (acc == null) {
        acc = SessionAcc(1L, t, t, 1L, e.value)
      } else if (t - acc.end > GapMicros) {
        out += SessionRow(userId, acc.idx, acc.start, acc.end, acc.n, acc.value)
        acc = SessionAcc(acc.idx + 1, t, t, 1L, e.value)
      } else {
        // A late but watermark-admissible event can have t < acc.end (state
        // from a prior micro-batch): never regress the session bounds.
        //
        // ACCEPTED batch/stream divergence: an admissible straggler with
        // t < acc.start - GapMicros is folded into the open session
        // (extending it backwards), whereas batch — which sees all events
        // sorted — would have emitted it as a separate earlier session and
        // shifted every later session_idx. Emitting a synthetic one-event
        // session here could not reproduce those batch indices either (the
        // open session's idx is already assigned), so we prefer the
        // no-data-loss merge; a tighter watermark bounds how far back a
        // straggler can land.
        acc = acc.copy(start = math.min(acc.start, t), end = math.max(acc.end, t),
          n = acc.n + 1, value = acc.value + e.value)
      }
    }
    if (flushOpen) {
      out += SessionRow(userId, acc.idx, acc.start, acc.end, acc.n, acc.value)
      if (state.exists) state.remove()
    } else {
      state.update(acc)
      state.setTimeoutTimestamp(acc.end / 1000 + GapMicros / 1000)
    }
    out.result().iterator
  }

  /** Batch-mode sessionization: every session emitted (open ones flushed).
    * Distributed: events shuffle once on user_id; per-user work is local.
    */
  def sessionizeBatch(events: Dataset[SessionEvent]): Dataset[SessionRow] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (uid, it, st: GroupState[SessionAcc]) => processGroup(uid, it, st, flushOpen = true))
  }

  /** Streaming sessionization: sessions emit when closed by a later event
    * or by event-time timeout past the gap. Requires a watermark on the
    * source (see spec).
    */
  def sessionizeStream(events: Dataset[SessionEvent]): Dataset[SessionRow] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (uid, it, st: GroupState[SessionAcc]) => processGroup(uid, it, st, flushOpen = false))
  }
}
