package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One tier-bearing input event (the purchase stream of the oracled
  * batch twin `etl_scd2`). `ts` stays a timestamp so the source
  * watermark flows into the stateful operator.
  */
case class TierEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Double)

/** One emitted dimension version. `valid_to_micros` is None on the open
  * (current) interval — only batch mode flushes those; in streaming the
  * open version lives in state until a later change closes it.
  */
case class Scd2Out(user_id: Long, version: Long, tier: String,
    valid_from_micros: Long, valid_to_micros: Option[Long], is_current: Boolean)

/** Open-version state carried between micro-batches. */
case class Scd2Acc(version: Long, tier: String, validFrom: Long,
    lastTs: Long, lastEid: Long)

/** Streaming SCD Type-2 dimension build via flatMapGroupsWithState — the
  * streaming twin of the oracled batch query `etl_scd2` (SURVEY §2a):
  * each user's purchase events derive a value tier (the same
  * high/mid/low thresholds), consecutive equal tiers are change-detected
  * away, and every tier CHANGE closes the previous validity interval,
  * which is emitted as a finished version row. A CDC consumer appends
  * these closed rows to the dimension table and looks up the open
  * version from state/the latest emit — the streaming form of a
  * slowly-changing dimension.
  *
  * Scale notes: state is ONE [[Scd2Acc]] per user with at least one
  * purchase — ∝ entities, never events; each emitted row is a closed
  * interval, emitted exactly once (append mode, no rewrites of history).
  *
  * ACCEPTED batch/stream divergence (the SessionStream straggler class):
  * a watermark-admissible straggler that sorts BEFORE the last applied
  * event cannot retro-edit versions that already emitted, so it is
  * DROPPED for history purposes — batch, which sees all events sorted,
  * would have interleaved it (possibly inserting a version). Emitted
  * history is immutable by design; a tighter watermark bounds how far
  * back a straggler can land.
  */
object Scd2Stream {

  /** The tier derivation shared with the batch twin (etl_scd2's CASE). */
  def tierOf(value: Double): String =
    if (value > 100) "high" else if (value > 10) "mid" else "low"

  private def micros(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L

  private def processGroup(uid: Long, events: Iterator[TierEvent],
      state: GroupState[Scd2Acc], flushOpen: Boolean): Iterator[Scd2Out] = {
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    val out = Seq.newBuilder[Scd2Out]
    var acc = state.getOption.orNull
    for (e <- sorted) {
      val t = micros(e.ts)
      if (acc == null) {
        acc = Scd2Acc(1L, tierOf(e.value), t, t, e.event_id)
      } else if (t < acc.lastTs || (t == acc.lastTs && e.event_id <= acc.lastEid)) {
        // straggler behind the last applied event — see the divergence
        // note above: emitted history never rewrites
      } else {
        val tier = tierOf(e.value)
        if (tier != acc.tier) {
          out += Scd2Out(uid, acc.version, acc.tier, acc.validFrom, Some(t),
            is_current = false)
          acc = Scd2Acc(acc.version + 1, tier, t, t, e.event_id)
        } else {
          acc = acc.copy(lastTs = t, lastEid = e.event_id)
        }
      }
    }
    if (acc != null) {
      if (flushOpen) {
        out += Scd2Out(uid, acc.version, acc.tier, acc.validFrom, None,
          is_current = true)
        if (state.exists) state.remove()
      } else {
        state.update(acc)
      }
    }
    out.result().iterator
  }

  /** Batch-mode SCD2: the full history including the open version per
    * user. Distributed: events shuffle once on user_id; per-user work is
    * local. The spec proves this equal to the oracled etl_scd2.
    */
  def scd2Batch(events: Dataset[TierEvent]): Dataset[Scd2Out] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (uid, it, st: GroupState[Scd2Acc]) => processGroup(uid, it, st, flushOpen = true))
  }

  /** Streaming SCD2: closed versions emit as later changes arrive; the
    * open version stays in state. Append-mode safe — no emitted row is
    * ever updated.
    */
  def scd2Stream(events: Dataset[TierEvent]): Dataset[Scd2Out] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (uid, it, st: GroupState[Scd2Acc]) => processGroup(uid, it, st, flushOpen = false))
  }
}
