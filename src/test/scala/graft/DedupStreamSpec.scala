package graft

import graft.streaming.DedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Spec for the streaming first-wins dedup (SURVEY §2j): duplicates inside
  * the watermark horizon are dropped, keys re-appearing after their state
  * expires pass again (bounded state — the property that lets the ingest
  * run forever), and the bounded-input path matches the batch
  * `etl_dedup_ingest` semantics.
  */
class DedupStreamSpec extends GraftSuite {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("duplicate key inside the watermark is dropped, first wins") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val input = mem.toDF().toDF("ts", "k", "value")
    val q = DedupStream.dedup(input, "ts", "10 minutes", Seq("k"))
      .writeStream.format("memory").queryName("dedup_stream_test")
      .outputMode("append").start()
    // batch 1: two fresh keys
    mem.addData((ts("2024-01-01 10:00:00"), "a", 1.0),
      (ts("2024-01-01 10:02:00"), "b", 2.0))
    q.processAllAvailable()
    // batch 2: "a" re-sent inside the horizon -> dropped; "c" advances the
    // watermark to 10:20 (> 10:00 + 10min), expiring "a"'s state
    mem.addData((ts("2024-01-01 10:05:00"), "a", 9.0),
      (ts("2024-01-01 10:30:00"), "c", 3.0))
    q.processAllAvailable()
    // batch 3: "a" again, above the watermark and after expiry -> passes
    mem.addData((ts("2024-01-01 10:25:00"), "a", 5.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup_stream_test").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Double]("value")))
    val byKey = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // the in-horizon duplicate (value 9.0) must never surface
    assert(byKey("a") === Set(1.0, 5.0), s"got $byKey")
    assert(byKey("b") === Set(2.0))
    assert(byKey("c") === Set(3.0))
    assert(rows.length === 4)
  }

  test("bounded input path matches batch etl_dedup_ingest semantics") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select(md5($"text").as("content_hash"), $"doc_id",
        to_timestamp(lit("2024-01-01 00:00:00")).as("ts"))
    val deduped = DedupStream.dedup(docs, "ts", "10 minutes", Seq("content_hash"))
    // one survivor per content hash — the unique-index ingest invariant
    val want = run("etl_dedup_ingest").select($"content_hash")
      .collect().map(_.getString(0)).toSet
    val got = deduped.select($"content_hash").collect().map(_.getString(0))
    assert(got.length === want.size, "exactly one row per content hash")
    assert(got.toSet === want)
  }
}
