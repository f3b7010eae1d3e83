package graft

import graft.streaming.{EventSource, EventStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The Kafka ingest seam (EventSource): the wire-format parse is the
  * whole logic of the source and runs identically on any frame shaped
  * like a Kafka record batch — these specs drive it with batch frames
  * and a MemoryStream standing in for the broker (no Kafka connector jar
  * or broker exists in this sandbox; `fromKafka` is the documented
  * deployment path wired through the same parse).
  */
class KafkaSourceSpec extends GraftSuite {

  private def wire(json: String): Array[Byte] = json.getBytes("UTF-8")

  test("wire parse: JSON value payloads become typed event rows") {
    import spark.implicits._
    val raw = Seq(
      wire("""{"event_id":1,"ts":"2024-01-01T10:00:00Z","user_id":7,"event_type":"view","value":2.5,"props":"{}"}"""),
      wire("""{"event_id":2,"ts":"2024-01-01T10:05:00Z","user_id":8,"event_type":"click","value":1.0,"props":null}"""))
      .toDF("value")
    val rows = EventSource.parseWire(raw).orderBy("event_id").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Long]("event_id") === 1L)
    assert(rows(0).getAs[Long]("user_id") === 7L)
    assert(rows(0).getAs[String]("event_type") === "view")
    assert(rows(0).getAs[Double]("value") === 2.5)
    assert(rows(1).getAs[String]("event_type") === "click")
  }

  test("wire parse drops corrupt payloads instead of failing the batch") {
    import spark.implicits._
    val raw = Seq(
      wire("""{"event_id":3,"ts":"2024-01-01T11:00:00Z","user_id":9,"event_type":"view","value":1.0,"props":"{}"}"""),
      wire("""not json at all"""),
      wire("""{"no_event_id":true}"""))
      .toDF("value")
    val rows = EventSource.parseWire(raw).collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[Long]("event_id") === 3L)
  }

  test("a Kafka-shaped memory stream flows through parse + window agg") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Array[Byte]]
    val parsed = EventSource.parseWire(mem.toDF().toDF("value"))
      .select($"ts", $"event_type", $"value")
    val q = EventStream.windowAgg(parsed)
      .writeStream.format("memory").queryName("kafka_seam_test")
      .outputMode("complete").start()
    mem.addData(
      wire("""{"event_id":1,"ts":"2024-01-01T10:10:00Z","user_id":1,"event_type":"view","value":2.0,"props":"{}"}"""),
      wire("""{"event_id":2,"ts":"2024-01-01T10:20:00Z","user_id":2,"event_type":"view","value":3.0,"props":"{}"}"""),
      wire("""garbage"""))
    q.processAllAvailable()
    val out = spark.table("kafka_seam_test").collect()
    q.stop()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("n") === 2L)
    assert(out(0).getAs[Double]("sum_value") === 5.0)
  }
}
