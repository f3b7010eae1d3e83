package graft.streaming

import graft.functions.{Portable => P}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming windowed aggregation (SURVEY §2j), the Spark-first
  * twin of the reference's micro-batch ETL + windowed counts
  * (reference: spark-streaming-pyspark/spark_streaming.py:85-174).
  *
  * The same plan runs in batch (where withWatermark is a no-op) and in
  * streaming, so the oracled batch query `st_window_agg` IS this code —
  * the streaming spec feeds a MemoryStream through the identical
  * transformation.
  *
  * Scale notes: watermarks bound state to open windows only; the window
  * agg is a keyed partial aggregation, so state ∝ (windows × types), not
  * events.
  */
object EventStream {

  /** Tumbling-window counts/sums per event_type over (streaming or batch)
    * events with schema (ts timestamp, event_type string, value double).
    */
  def windowAgg(events: DataFrame, watermark: String = "1 hour",
      win: String = "1 hour"): DataFrame =
    windowAggOf(events.withWatermark("ts", watermark), win)

  /** [[windowAgg]] over an ALREADY-watermarked frame — the composed-
    * pipeline entry ([[PipelineStream]]): a stream that went through an
    * upstream stateful stage (dedup) already carries its watermark, and
    * re-declaring one is disallowed under multi-stateful-operator plans.
    */
  def windowAggOf(watermarked: DataFrame, win: String = "1 hour"): DataFrame = {
    val s = watermarked.sparkSession
    import s.implicits._
    watermarked
      .groupBy(window($"ts", win), $"event_type")
      .agg(P.cnt.as("n"), P.dsum($"value").as("sum_value"))
      .select($"window.start".as("window_start"), $"event_type", $"n", $"sum_value")
  }
}
