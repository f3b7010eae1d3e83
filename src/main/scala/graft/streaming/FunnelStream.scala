package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join (SURVEY §2j): view→purchase
  * conversion pairs within one hour — the one Structured Streaming join
  * shape the rest of the suite didn't exercise (EventStream = windowed
  * agg, EnrichStream = stream-static, SessionStream = custom state,
  * DedupStream = keyed dedup). The reference's funnel panel computes the
  * same pairing in batch (dashboard conversion views); here ONE dataflow
  * serves both: the oracled batch twin `st_funnel_join` and the
  * streaming entry below.
  *
  * Scale notes: the join is an EQUI join on user_id with a range bound
  * on the time columns — state is keyed by user and, in streaming, the
  * time bound plus both watermarks lets Spark expire view-side state
  * once `view_ts + 1h` falls behind the purchase watermark (and
  * vice versa), so state is bounded by the window, not the stream
  * length. In batch the same plan is a keyed shuffle join whose range
  * predicate filters post-match — never a cross product.
  */
object FunnelStream {

  /** view→purchase pairs within [view_ts, view_ts + 1h], from two event
    * frames (streaming or batch). Column-renamed inputs so the self-join
    * on a single events source stays unambiguous.
    */
  def funnelJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val s = views.sparkSession
    import s.implicits._
    val v = views.select($"event_id".as("view_id"),
      $"user_id".as("v_user"), $"ts".as("view_ts"))
    val p = purchases.select($"event_id".as("purchase_id"),
      $"user_id".as("p_user"), $"ts".as("purchase_ts"),
      $"value".as("purchase_value"))
    v.join(p, $"v_user" === $"p_user" &&
        $"purchase_ts" >= $"view_ts" &&
        $"purchase_ts" <= $"view_ts" + expr("INTERVAL 1 HOUR"))
      .select($"view_id", $"purchase_id", $"v_user".as("user_id"),
        $"view_ts", $"purchase_ts", $"purchase_value")
  }

  /** Streaming entry: split one event stream into the two sides, add a
    * watermark to EACH (stream-stream joins require both so either side's
    * state can expire), then the same join as the batch twin.
    */
  def funnelStream(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val views = events.filter($"event_type" === "view").withWatermark("ts", watermark)
    val purchases = events.filter($"event_type" === "purchase").withWatermark("ts", watermark)
    funnelJoin(views, purchases)
  }
}
