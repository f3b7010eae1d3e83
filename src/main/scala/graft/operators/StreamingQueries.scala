package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{PortableSql => PS}
import graft.streaming.EventStream

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

  val defs: Seq[QueryDef] = Seq(windowAgg)
}
