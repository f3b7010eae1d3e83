package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming spike/anomaly panel (SURVEY §2j) — the live twin of the
  * batch `an_spike_days` z-score rule: flag windows whose event count
  * sits more than z standard deviations above the mean of all windows
  * seen for that event type.
  *
  * Same decomposition as [[TrendingStream]] (a rank/statistic over a
  * streaming aggregate would force complete output mode — unbounded
  * re-emission at scale):
  *
  *  1. WRITE side: the [[UpsertSink]] windowed-count upsert, unchanged —
  *     state and emission bounded by open windows × event types, late
  *     events replace their window row;
  *  2. READ side: [[spikes]] computes mean/σ over the store's window
  *     rows for ONE event type at page-view time — a scan of
  *     |windows| store entries, paid per view, not per event.
  *
  * A late event that lifts (or deflates) a window re-ranks it
  * automatically on the next read, because the upsert replaced the row.
  * Population σ over the observed windows, matching an_spike_days'
  * exact-integer 2σ rule in spirit (the store's counts are longs; the
  * threshold arithmetic is driver-side doubles — this is a serving
  * panel, not an oracled query).
  */
object SpikeStream {

  /** Start the write side (delegates to [[UpsertSink.upsertQuery]] —
    * the same store can serve trending AND spike panels).
    */
  def spikeQuery(events: DataFrame, storeId: String, queryName: String,
      watermark: String = "1 hour", win: String = "1 hour"): StreamingQuery =
    UpsertSink.upsertQuery(events, storeId, queryName, watermark, win)

  /** Read side: windows of `eventType` whose count exceeds
    * mean + z·σ over all of that type's windows in the store, as
    * (window_start, count, z_score), in window-time order. Fewer than 2
    * windows (or σ = 0) → no spikes, by definition.
    */
  def spikes(storeId: String, eventType: String, z: Double = 2.0): Seq[(String, Long, Double)] = {
    val rows = UpsertSink.snapshot(storeId).toSeq.collect {
      case ((w, t), (n, _)) if t == eventType => (w, n)
    }
    if (rows.sizeIs < 2) return Seq.empty
    val mean = rows.map(_._2).sum.toDouble / rows.size
    val varp = rows.map { case (_, n) => (n - mean) * (n - mean) }.sum / rows.size
    val std = math.sqrt(varp)
    if (std == 0.0) return Seq.empty
    rows.collect { case (w, n) if n > mean + z * std => (w, n, (n - mean) / std) }
      .sortBy { case (w, _, _) => java.sql.Timestamp.valueOf(w).getTime }
  }
}
