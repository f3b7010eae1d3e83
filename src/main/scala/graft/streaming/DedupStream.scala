package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming deduplication (SURVEY §2j) — the Structured-Streaming twin of
  * the batch `etl_dedup_ingest` first-wins ingest (the reference enforces
  * the same semantics with a unique index in its consumer,
  * reference: spark-streaming-pyspark/spark_streaming.py:94-174).
  *
  * Scale notes: `dropDuplicatesWithinWatermark` keeps a key only until the
  * watermark passes its event time, so dedup state is bounded by the
  * watermark horizon — the property that lets a 100 TB/day ingest dedup
  * run forever. Plain `dropDuplicates` on a stream would grow state
  * without bound. The key state is hash-partitioned by Spark's streaming
  * state store, so it shards across executors.
  */
object DedupStream {

  /** First-wins dedup on `keyCols` over a stream with event-time column
    * `tsCol`. Late re-sends inside the watermark horizon are dropped;
    * the same plan is the batch `dropDuplicates` when the input is bounded.
    */
  def dedup(events: DataFrame, tsCol: String, watermark: String,
      keyCols: Seq[String]): DataFrame = {
    val wm = events.withWatermark(tsCol, watermark)
    if (events.isStreaming) wm.dropDuplicatesWithinWatermark(keyCols)
    else wm.dropDuplicates(keyCols)
  }
}
