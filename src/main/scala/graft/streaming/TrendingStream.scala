package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming "trending now" panel (SURVEY §2j) — windowed top-k over an
  * event stream, the live twin of the batch `an_top_groups` /
  * `an_pivot_daily` panels (the reference's dashboard reads exactly this
  * from its store; reference: dashboard/dashboard.py:256-287 over the
  * streaming sink's output).
  *
  * Ranking is NOT computed inside the stream: a rank over a streaming
  * aggregate forces complete output mode (re-emitting every window every
  * batch — unbounded re-emission at scale). The scalable decomposition is
  * the one real dashboards use:
  *
  *  1. WRITE side: update-mode windowed counts upserted key-wise into the
  *     serving store ([[UpsertSink]] — state and emission bounded by
  *     open windows × event types, late events replace their window row);
  *  2. READ side: [[topk]] ranks ONE window's rows at query time — a sort
  *     of ≤ |event types| rows, paid per page view, not per event.
  *
  * Re-ranking after a late event is automatic: the upsert replaced the
  * window row, so the next read sees the corrected order.
  */
object TrendingStream {

  /** Start the write side: windowed counts per event type, upserted into
    * store `storeId` (delegates to [[UpsertSink.upsertQuery]]).
    */
  def trendingQuery(events: DataFrame, storeId: String, queryName: String,
      watermark: String = "1 hour", win: String = "1 hour"): StreamingQuery =
    UpsertSink.upsertQuery(events, storeId, queryName, watermark, win)

  /** Read side: the top-k event types of one window by count (ties by
    * type name — deterministic), served from the upsert store.
    *
    * The store keys windows by `Timestamp.toString` (e.g.
    * `2024-01-01 10:00:00.0`); both sides are parsed back to epoch
    * millis before comparing (r10 ADVICE), so a caller passing the
    * natural `2024-01-01 10:00:00` form matches instead of silently
    * getting an empty page indistinguishable from an unknown window.
    */
  def topk(storeId: String, windowStart: String, k: Int): Seq[(String, Long)] = {
    // accept the ISO 'T' separator too; an unparseable windowStart
    // raises IllegalArgumentException from Timestamp.valueOf — a loud
    // contract error, deliberately NOT an empty page (an empty page
    // means "window unknown", which is a different answer)
    val want = java.sql.Timestamp.valueOf(windowStart.replace('T', ' ')).getTime
    UpsertSink.snapshot(storeId).toSeq
      .collect { case ((w, t), (n, _))
        if java.sql.Timestamp.valueOf(w).getTime == want => (t, n) }
      .sortBy { case (t, n) => (-n, t) }
      .take(k)
  }
}
