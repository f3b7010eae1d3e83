package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded-media metadata row. */
case class MediaMeta(doc_id: Long, width: Int, height: Int, format: String,
    n_bytes: Long)

/** Multimodal media pipeline (SURVEY §2i): images/audio/video ride Spark
  * as opaque binary columns; decode / feature-extract runs batched per
  * partition via mapPartitions.
  *
  * The actual codec is STUBBED (this container has no image/audio libs):
  * [[decodeBatch]] produces a deterministic fake decode from the payload
  * bytes. Everything around it — schema, partitioning, per-partition
  * batching, the Dataset plumbing — is real and spec-tested, so swapping
  * in a real codec is a one-function change.
  *
  * Scale notes: mapPartitions keeps the (large) payloads local — no
  * shuffle; batching amortizes per-call codec setup exactly like a Pandas
  * UDF batch would; output is a narrow typed Dataset that downstream
  * queries can aggregate without touching payload bytes again.
  */
object MediaPipeline {

  val BatchSize = 32

  /** Attach a binary payload column to documents (id, payload). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** STUB codec: deterministic fake decode of one media payload.
    * A real implementation would hand `payload` to an image/audio codec;
    * the fake derives stable dimensions from the payload bytes so specs
    * can assert exact values.
    */
  private[multimodal] def decodeOne(docId: Long, payload: Array[Byte]): MediaMeta = {
    val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
    val b1 = if (payload.length > 1) payload(1) & 0xff else 0
    MediaMeta(
      doc_id = docId,
      width = 16 + b0 % 64,
      height = 16 + b1 % 64,
      format = if (payload.length % 2 == 0) "fake/png" else "fake/jpeg",
      n_bytes = payload.length.toLong)
  }

  /** Batched partition-local decode: payloads grouped into fixed-size
    * batches (mirroring a real codec's batch API) and decoded in place.
    */
  def decode(withPayloadDf: DataFrame): Dataset[MediaMeta] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select($"doc_id".cast("long"), $"payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          // real codec: decodeBatch(batch.map(_._2)); stub: per-item fake
          batch.map { case (id, payload) => decodeOne(id, payload) }
        }
      }
  }
}
