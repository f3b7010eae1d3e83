package graft

import graft.streaming.{EventStream, SessionEvent, SessionStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends GraftSuite {

  test("batch sessionization matches the oracled etl_sessionize query") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .as[SessionEvent]
    val got = SessionStream.sessionizeBatch(ev)
      .select($"user_id", $"session_idx", $"start_micros", $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = run("etl_sessionize")
      .select($"user_id", $"session_idx", unix_micros($"session_start"), $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want)
  }

  test("file-source parquet stream matches the oracled batch window agg") {
    import spark.implicits._
    // raw on-disk schema (ts is long: nanosAsLong), converted exactly as
    // Tables.events does — the real file-stream ingest path, not a memory
    // stub. The file source wants a directory: link the table in.
    val path = s"$sfDir/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    dir.toFile.deleteOnExit()
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(path))
    val raw = spark.readStream
      .schema(spark.read.parquet(path).schema).parquet(dir.toString)
    val ev = raw.select(
      Tables.normalizeTs(spark.read.parquet(path).schema("ts").dataType).as("ts"),
      $"event_type", $"value")
    val q = EventStream.windowAgg(ev)
      .writeStream.format("memory").queryName("file_stream_test")
      .outputMode("complete").start()
    q.processAllAvailable()
    val got = spark.table("file_stream_test").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet
    q.stop()
    val want = run("st_window_agg").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet
    assert(got === want)
  }

  test("streaming window agg over a MemoryStream equals the batch twin") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val input = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.windowAgg(input)
      .writeStream.format("memory").queryName("win_agg_test")
      .outputMode("complete").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:15:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:45:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-01 11:05:00")
    mem.addData((t0, "view", 1.0), (t1, "view", 2.0), (t2, "click", 4.0))
    q.processAllAvailable()
    val rows = spark.table("win_agg_test").collect()
    q.stop()
    assert(rows.length === 2)
    val byKey = rows.map(r => (r.getAs[java.sql.Timestamp]("window_start").toString,
      r.getAs[String]("event_type")) -> (r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toMap
    assert(byKey(("2024-01-01 10:00:00.0", "view")) === ((2L, 3.0)))
    assert(byKey(("2024-01-01 11:00:00.0", "click")) === ((1L, 4.0)))
  }

  test("stream-static enrichment join over a MemoryStream matches the batch semantics") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val input = mem.toDF().toDF("ts", "user_id", "value")
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("cust_id", "segment")
    val q = streaming.EnrichStream.enrichAgg(input, dim)
      .writeStream.format("memory").queryName("enrich_agg_test")
      .outputMode("complete").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 3 has no dimension row and must be dropped by the inner join
    mem.addData((ts("2024-01-01 10:15:00"), 1L, 1.0),
      (ts("2024-01-01 10:45:00"), 1L, 2.0),
      (ts("2024-01-01 10:50:00"), 2L, 8.0),
      (ts("2024-01-01 10:55:00"), 3L, 99.0))
    q.processAllAvailable()
    val rows = spark.table("enrich_agg_test").collect()
    q.stop()
    val byKey = rows.map(r => (r.getAs[java.sql.Timestamp]("window_start").toString,
      r.getAs[String]("segment")) -> (r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toMap
    assert(byKey.size === 2)
    assert(byKey(("2024-01-01 10:00:00.0", "BUILDING")) === ((2L, 3.0)))
    assert(byKey(("2024-01-01 10:00:00.0", "MACHINERY")) === ((1L, 8.0)))
  }

  test("foreachBatch upsert sink replaces window rows instead of appending") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val input = mem.toDF().toDF("ts", "event_type", "value")
    val sid = "upsert_spec"
    streaming.UpsertSink.clear(sid)
    val q = streaming.UpsertSink.upsertQuery(input, sid, "upsert_test")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: two views in the 10:00 window
    mem.addData((ts("2024-01-01 10:15:00"), "view", 1.0),
      (ts("2024-01-01 10:45:00"), "view", 2.0))
    q.processAllAvailable()
    val afterFirst = streaming.UpsertSink.snapshot(sid)
    assert(afterFirst(("2024-01-01 10:00:00.0", "view")) === ((2L, 3.0)))
    // batch 2: same window key updated + a new window — the updated row
    // must REPLACE the stored one (upsert), not append a duplicate
    mem.addData((ts("2024-01-01 10:50:00"), "view", 4.0),
      (ts("2024-01-01 11:05:00"), "click", 8.0))
    q.processAllAvailable()
    q.stop()
    val fin = streaming.UpsertSink.snapshot(sid)
    assert(fin(("2024-01-01 10:00:00.0", "view")) === ((3L, 7.0)))
    assert(fin(("2024-01-01 11:00:00.0", "click")) === ((1L, 8.0)))
    assert(fin.size === 2, s"exactly one row per window key, got $fin")
    streaming.UpsertSink.clear(sid)
  }

  test("trending stream: read-time top-k re-ranks after a late-window update") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val input = mem.toDF().toDF("ts", "event_type", "value")
    val sid = "trending_spec"
    streaming.UpsertSink.clear(sid)
    val q = streaming.TrendingStream.trendingQuery(input, sid, "trending_test")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // window 10:00 — clicks lead 2:1
    mem.addData((ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:10:00"), "click", 1.0),
      (ts("2024-01-01 10:15:00"), "view", 1.0))
    q.processAllAvailable()
    assert(streaming.TrendingStream.topk(sid, "2024-01-01 10:00:00.0", 2) ===
      Seq(("click", 2L), ("view", 1L)))
    // the natural timestamp form (no trailing .0) addresses the same
    // window — keys are compared as parsed timestamps, not raw strings
    assert(streaming.TrendingStream.topk(sid, "2024-01-01 10:00:00", 2) ===
      Seq(("click", 2L), ("view", 1L)))
    // two late views flip the order — the upsert replaces the window row
    // and the next read sees the corrected ranking
    mem.addData((ts("2024-01-01 10:20:00"), "view", 1.0),
      (ts("2024-01-01 10:25:00"), "view", 1.0))
    q.processAllAvailable()
    q.stop()
    assert(streaming.TrendingStream.topk(sid, "2024-01-01 10:00:00.0", 2) ===
      Seq(("view", 3L), ("click", 2L)))
    // k caps the page; an unknown window serves an empty page
    assert(streaming.TrendingStream.topk(sid, "2024-01-01 10:00:00.0", 1) ===
      Seq(("view", 3L)))
    assert(streaming.TrendingStream.topk(sid, "2024-01-01 11:00:00.0", 3).isEmpty)
    streaming.UpsertSink.clear(sid)
  }

  test("spike stream: only the anomalous window flags; a late event re-ranks it") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val input = mem.toDF().toDF("ts", "event_type", "value")
    val sid = "spike_spec"
    streaming.UpsertSink.clear(sid)
    val q = streaming.SpikeStream.spikeQuery(input, sid, "spike_test")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // five calm hourly windows of 2 clicks, one window with 20
    val calm = for {
      h <- Seq("08", "09", "10", "11", "12")
      m <- Seq("05", "35")
    } yield (ts(s"2024-01-01 $h:$m:00"), "click", 1.0)
    val burst = (1 to 20).map(i => (ts(f"2024-01-01 13:${i + 10}%02d:00"), "click", 1.0))
    mem.addData(calm ++ burst: _*)
    q.processAllAvailable()
    val flagged = streaming.SpikeStream.spikes(sid, "click", 2.0)
    assert(flagged.map(_._1) === Seq("2024-01-01 13:00:00.0"))
    assert(flagged.head._2 === 20L)
    assert(flagged.head._3 > 2.0)
    // a calm type never flags; an unknown type is empty
    assert(streaming.SpikeStream.spikes(sid, "view", 2.0).isEmpty)
    // late events lift a calm window into spike range: the upsert
    // replaces its row and the next read re-ranks
    mem.addData((1 to 18).map(i => (ts(f"2024-01-01 12:${i + 40}%02d:00"), "click", 1.0)): _*)
    q.processAllAvailable()
    q.stop()
    val after = streaming.SpikeStream.spikes(sid, "click", 1.0)
    assert(after.map(_._1) === Seq("2024-01-01 12:00:00.0", "2024-01-01 13:00:00.0"))
    streaming.UpsertSink.clear(sid)
  }

  test("streaming sessionization emits closed sessions as watermark advances") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Long, Double)]
    val ev = mem.toDF().toDF("ts", "user_id", "event_id", "value")
      .withWatermark("ts", "0 seconds")
      .select($"user_id", $"event_id", $"ts", $"value")
      .as[SessionEvent]
    val q = SessionStream.sessionizeStream(ev)
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // session 1: two events 10 min apart; then a 2h silence; session 2
    mem.addData((ts("2024-01-01 08:00:00"), 7L, 1L, 1.0),
      (ts("2024-01-01 08:10:00"), 7L, 2L, 2.0))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 10:30:00"), 7L, 3L, 3.0))
    q.processAllAvailable()
    // advance watermark far enough to time the open session out
    mem.addData((ts("2024-01-01 13:00:00"), 8L, 4L, 0.5))
    q.processAllAvailable()
    val rows = spark.table("sess_test").collect()
    q.stop()
    val u7 = rows.filter(_.getAs[Long]("user_id") == 7L)
      .map(r => (r.getAs[Long]("session_idx"), r.getAs[Long]("n_events"))).toSet
    assert(u7.contains((1L, 2L)), s"first session should close with 2 events, got ${u7.mkString(",")}")
  }

  test("late admissible event never regresses open-session bounds") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Long, Double)]
    val ev = mem.toDF().toDF("ts", "user_id", "event_id", "value")
      .withWatermark("ts", "1 hour")
      .select($"user_id", $"event_id", $"ts", $"value")
      .as[SessionEvent]
    val q = SessionStream.sessionizeStream(ev)
      .writeStream.format("memory").queryName("sess_late_test")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def micros(s: String) = ts(s).getTime * 1000L
    mem.addData((ts("2024-01-01 08:00:00"), 7L, 1L, 1.0),
      (ts("2024-01-01 08:20:00"), 7L, 2L, 2.0))
    q.processAllAvailable()
    // late (t < open session end 08:20) but inside the 1h watermark window
    mem.addData((ts("2024-01-01 08:10:00"), 7L, 3L, 3.0))
    q.processAllAvailable()
    // push the watermark past end + gap so the session times out and emits
    mem.addData((ts("2024-01-01 12:00:00"), 9L, 4L, 0.5))
    q.processAllAvailable()
    val rows = spark.table("sess_late_test").collect()
    q.stop()
    val u7 = rows.filter(_.getAs[Long]("user_id") == 7L)
      .map(r => (r.getAs[Long]("n_events"), r.getAs[Long]("start_micros"), r.getAs[Long]("end_micros")))
    assert(u7.toSeq === Seq((3L, micros("2024-01-01 08:00:00"), micros("2024-01-01 08:20:00"))),
      s"late event must fold without regressing end, got ${u7.mkString(",")}")
  }

  test("watermarked stream-stream funnel join matches the oracled batch twin") {
    import spark.implicits._
    import graft.streaming.FunnelStream
    implicit val sq = spark.sqlContext
    // one memory stream of (event_id, ts, user_id, event_type, value)
    // rows, split inside funnelStream into the two watermarked sides —
    // the real stream-stream shape, not two pre-joined frames
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val input = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = FunnelStream.funnelStream(input)
      .writeStream.format("memory").queryName("funnel_stream_test")
      .outputMode("append").start()
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    mem.addData(
      (1L, t("2024-01-01 10:00:00"), 7L, "view", 0.0),
      (2L, t("2024-01-01 10:20:00"), 7L, "purchase", 9.5),   // inside 1h -> pair
      (3L, t("2024-01-01 10:10:00"), 8L, "view", 0.0),
      (4L, t("2024-01-01 12:00:00"), 8L, "purchase", 3.0),   // outside 1h -> no pair
      (5L, t("2024-01-01 10:30:00"), 7L, "purchase", 1.5),   // second pair for view 1
      (6L, t("2024-01-01 09:50:00"), 7L, "purchase", 2.0))   // before the view -> no pair
    q.processAllAvailable()
    // advance both watermarks past every event so all matches are emitted
    mem.addData((99L, t("2024-01-02 00:00:00"), 1L, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_stream_test").collect()
      .map(r => (r.getAs[Long]("view_id"), r.getAs[Long]("purchase_id"),
        r.getAs[Double]("purchase_value"))).toSet
    assert(got === Set((1L, 2L, 9.5), (1L, 5L, 1.5)), s"got $got")
  }

  test("funnel join matches an independently-written pairing on real data") {
    import spark.implicits._
    import graft.streaming.FunnelStream
    val ev = Tables.events(spark, sfDir)
    val got = FunnelStream.funnelJoin(
        ev.filter($"event_type" === "view"),
        ev.filter($"event_type" === "purchase"))
      .select($"view_id", $"purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent formulation (driver-side pairing over collected rows, no
    // shared dataflow with funnelJoin) — catches wrong bounds/intervals
    // that a registry round-trip could not, since st_funnel_join IS
    // funnelJoin
    val rows = ev.select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val views = rows.filter(_._3 == "view")
    val purch = rows.filter(_._3 == "purchase")
    val want = (for {
      v <- views; p <- purch
      if p._2 == v._2 && p._4 >= v._4 && p._4 <= v._4 + 3600L * 1000000L
    } yield (v._1, p._1)).toSet
    assert(got === want && got.nonEmpty)
  }

  test("streaming scd2: batch twin equals the oracled etl_scd2; history emits once") {
    import spark.implicits._
    import graft.streaming.{Scd2Stream, TierEvent, Scd2Out}
    val ev = Tables.events(spark, sfDir).filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value").as[TierEvent]
    val got = Scd2Stream.scd2Batch(ev).collect()
      .map(r => (r.user_id, r.version, r.tier, r.valid_from_micros,
        r.valid_to_micros.getOrElse(-1L), r.is_current)).toSet
    val want = run("etl_scd2")
      .select($"user_id", $"version", $"tier", unix_micros($"valid_from"),
        coalesce(unix_micros($"valid_to"), lit(-1L)), $"is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    assert(got === want && got.nonEmpty)
    // MemoryStream: a version closes ONLY when the change arrives, closed
    // rows emit exactly once, and a straggler never rewrites history
    def us(t: String): Long = {
      val ts = java.sql.Timestamp.valueOf(t)
      ts.toInstant.getEpochSecond * 1000000L + ts.getNanos / 1000L
    }
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[TierEvent]
    val q = Scd2Stream.scd2Stream(ms.toDS()).writeStream.format("memory")
      .queryName("scd2_stream_test").outputMode("append").start()
    ms.addData(TierEvent(1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 5.0))
    q.processAllAvailable()
    assert(spark.table("scd2_stream_test").isEmpty) // only the open version exists
    ms.addData(TierEvent(1L, 2L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 200.0))
    q.processAllAvailable()
    val rows = spark.table("scd2_stream_test").as[Scd2Out].collect()
    assert(rows.toSeq === Seq(Scd2Out(1L, 1L, "low",
      us("2024-01-01 10:00:00"), Some(us("2024-01-02 10:00:00")), is_current = false)))
    // straggler behind the applied change: dropped, never a rewrite
    ms.addData(TierEvent(1L, 0L, java.sql.Timestamp.valueOf("2024-01-01 05:00:00"), 500.0))
    q.processAllAvailable()
    assert(spark.table("scd2_stream_test").count() === 1)
    q.stop()
  }
}
