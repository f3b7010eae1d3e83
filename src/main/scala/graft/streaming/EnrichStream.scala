package graft.streaming

import graft.functions.{Portable => P}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment join (SURVEY §2j): a streaming fact source
  * joined against a bounded dimension, then a windowed per-segment
  * aggregation — the Spark-first form of the reference's consumer-side
  * lookup enrichment (reference:
  * spark-streaming-pyspark/spark_streaming.py:85-174, which decorates
  * each micro-batch with static metadata before aggregating).
  *
  * Scale notes: the static side is re-read and broadcast at each trigger, so
  * dimension updates between micro-batches are picked up without a
  * restart; a dimension that outgrows the broadcast threshold falls back
  * to a per-batch shuffle join automatically. The watermark bounds window
  * state to open windows exactly as in [[EventStream]].
  */
object EnrichStream {

  /** events(ts, user_id, value) ⋈ dim(cust_id, segment) → per-window,
    * per-segment counts and exact decimal sums. The same plan runs in
    * batch (the oracled `st_enrich_agg`) and in streaming (the spec feeds
    * a MemoryStream through this exact code).
    */
  def enrichAgg(events: DataFrame, dim: DataFrame,
      watermark: String = "1 hour", win: String = "1 hour"): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", watermark)
      .join(broadcast(dim), $"user_id" === $"cust_id")
      .groupBy(window($"ts", win), $"segment")
      .agg(P.cnt.as("n"), P.dsum($"value").as("sum_value"))
      .select($"window.start".as("window_start"), $"segment", $"n", $"sum_value")
  }
}
