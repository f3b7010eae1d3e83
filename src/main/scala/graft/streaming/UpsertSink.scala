package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** foreachBatch upsert sink (SURVEY §2j) — the Spark-first twin of the
  * reference's micro-batch upsert writer, which merges each batch's
  * windowed aggregates into a document store keyed by (window, type)
  * (reference: spark-streaming-pyspark/spark_streaming.py:94-174).
  *
  * Update-mode window aggregates + key-wise last-write-wins merge give the
  * upsert contract: re-emitting a window's row (because a late event
  * updated it, or because a failed batch replayed) REPLACES the stored row
  * instead of appending a duplicate — the store converges to the same
  * content a batch run would produce.
  *
  * Scale notes: rows are written per PARTITION (one store connection per
  * partition-task, the foreachBatch idiom for JDBC/Mongo/Delta MERGE
  * targets), never collected to the driver; the aggregate output is
  * bounded by open windows × event types, not by events. The in-memory
  * [[KeyedStore]] stands in for the external store (local[*] only — on a
  * real cluster the closure would open its JDBC/Mongo writer instead;
  * same shape, different `put`).
  */
object UpsertSink {

  type Key = (String, String) // (window_start, event_type)
  type Agg = (Long, Double) // (n, sum_value)

  /** Keyed last-write-wins store, addressed by id so executor-side closures
    * (same JVM under local[*]) resolve it statically instead of dragging a
    * serialized copy whose mutations would be lost.
    */
  private val stores = new ConcurrentHashMap[String, ConcurrentHashMap[Key, Agg]]()

  def store(id: String): ConcurrentHashMap[Key, Agg] =
    stores.computeIfAbsent(id, _ => new ConcurrentHashMap[Key, Agg]())

  def clear(id: String): Unit = stores.remove(id)

  def snapshot(id: String): Map[Key, Agg] = {
    import scala.jdk.CollectionConverters._
    store(id).asScala.toMap
  }

  /** Start the windowed aggregate → upsert pipeline on a streaming events
    * frame (ts, event_type, value). Update output mode: each micro-batch
    * carries only the window keys whose aggregate changed.
    */
  def upsertQuery(events: DataFrame, storeId: String, queryName: String,
      watermark: String = "1 hour", win: String = "1 hour"): StreamingQuery =
    upsertAggQuery(EventStream.windowAgg(events, watermark, win), storeId, queryName)

  /** The upsert sink over an already-built windowed aggregate — the
    * composed-pipeline entry (the aggregate's watermark came from an
    * upstream stage; see [[EventStream.windowAggOf]]). Pass `checkpoint`
    * for a RESTARTABLE query (production: always) — a restart resumes
    * from the committed offsets/state, and a replayed micro-batch is
    * harmless because the keyed put is idempotent: re-emitting a
    * window's row replaces the stored row, so the store converges to the
    * batch-run content across any crash/restart boundary (the
    * foreachBatch exactly-once-EFFECT discipline: offsets+state
    * transactional in the checkpoint, sink writes idempotent by key).
    */
  def upsertAggQuery(agg: DataFrame, storeId: String, queryName: String,
      checkpoint: Option[String] = None): StreamingQuery = {
    val w = agg
      .writeStream
      .outputMode("update")
      .queryName(queryName)
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: Dataset[Row], _: Long) =>
        val sid = storeId
        batch.foreachPartition { rows: Iterator[Row] =>
          val st = UpsertSink.store(sid)
          rows.foreach { r =>
            st.put(
              (r.getAs[java.sql.Timestamp]("window_start").toString,
                r.getAs[String]("event_type")),
              (r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
          }
        }
      }
      .start()
  }
}
