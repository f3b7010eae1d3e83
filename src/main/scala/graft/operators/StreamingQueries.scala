package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{PortableSql => PS}
import graft.streaming.{EnrichStream, EventStream, FunnelStream}

/** Batch twins of the streaming pipelines (SURVEY §2j). `st_window_agg`
  * runs [[EventStream.windowAgg]] — the exact code the streaming job runs
  * — in batch mode against the events table, so the DuckDB oracle checks
  * the streaming transformation itself.
  */
object StreamingQueries {

  val windowAgg = QueryDef(
    "st_window_agg",
    s"""WITH ${PS.evCte}
       |SELECT date_trunc('hour', ts) AS window_start, event_type,
       |  COUNT(*) AS n, ${PS.dsum("value")} AS sum_value
       |FROM ev GROUP BY 1, 2
       |ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
    EventStream.windowAgg(Tables.events(s, dir))
      .orderBy("window_start", "event_type")
  }

  /** Batch twin of [[EnrichStream.enrichAgg]]: events enriched with the
    * customer market segment, hourly per-segment windows.
    */
  val enrichAgg = QueryDef(
    "st_enrich_agg",
    s"""WITH ${PS.evCte}
       |SELECT date_trunc('hour', ev.ts) AS window_start,
       |  c.c_mktsegment AS segment,
       |  COUNT(*) AS n, ${PS.dsum("ev.value")} AS sum_value
       |FROM ev JOIN customer c ON ev.user_id = c.c_custkey
       |GROUP BY 1, 2
       |ORDER BY window_start, segment""".stripMargin) { (s, dir) =>
    import s.implicits._
    val dim = Tables.customer(s, dir)
      .select($"c_custkey".as("cust_id"), $"c_mktsegment".as("segment"))
    EnrichStream.enrichAgg(Tables.events(s, dir), dim)
      .orderBy("window_start", "segment")
  }

  /** Batch twin of [[FunnelStream.funnelJoin]]: view→purchase conversion
    * pairs within one hour per user — the oracle checks the exact
    * dataflow the watermarked stream-stream join runs.
    */
  val funnelJoin = QueryDef(
    "st_funnel_join",
    s"""WITH ${PS.evCte}
       |SELECT a.event_id AS view_id, b.event_id AS purchase_id,
       |  a.user_id, a.ts AS view_ts, b.ts AS purchase_ts,
       |  b.value AS purchase_value
       |FROM ev a JOIN ev b ON b.user_id = a.user_id
       |  AND a.event_type = 'view' AND b.event_type = 'purchase'
       |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ev = Tables.events(s, dir)
    // two pushed-filter scans of events, deliberately: the stream-stream
    // join needs two inputs, the oracle's `FROM ev a JOIN ev b` reads the
    // relation twice the same way, and each scan's event_type predicate
    // prunes at the parquet row-group level — a one-scan tag-and-split
    // would need a materialization barrier to avoid the second read.
    FunnelStream.funnelJoin(
      ev.filter($"event_type" === "view"),
      ev.filter($"event_type" === "purchase"))
  }

  val defs: Seq[QueryDef] = Seq(windowAgg, enrichAgg, funnelJoin)
}
